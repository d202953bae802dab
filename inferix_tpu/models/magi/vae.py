"""MAGI ViT-VAE in functional JAX — reference-faithful layer graph.

Parity with the reference `ViTVAE` (`inferix/models/magi/vae/vae_model.py:220-340`,
`vae_module.py:31-757`): 3D-patch ViT encoder -> DiagonalGaussian latent ->
ViT decoder. Architecture features reproduced exactly so REAL MAGI VAE
checkpoints load through `convert_magi_vae_state_dict`
(`utils/checkpoint.py`):

* LEARNABLE positional embeddings `[1, num_patches + cls, D]` with trilinear
  resize when the input geometry differs from the pretrain geometry
  (`resize_pos_embed`, vae_module.py:400-406) and a prepended cls token.
* 3D ROTARY embeddings on q/k (all tokens except cls): `freq_bands` step=1
  bands (vae_module.py:55-60), per-axis coords with the temporal axis
  uncentered and spatial axes centered (`build_fourier_pos_embed`
  center_imgidx, :119-125), eva-style rescale to `ref_feat_shape=(4,16,16)`
  (:129-132), sin/cos `repeat_interleave(2)` + INTERLEAVED rotation
  (`rot`, :142-150).
* `ln_in_attn`: no pre-norm before attention; instead `ManualLayerNorm`
  over the head dim of the packed qkv — `(x - mean) / (std + eps)` with
  BIASED std and eps added to the std, no affine (vae_module.py:229-242).
* Decoder `use_final_proj` linear + LayerNorm, unpatchify, and a 3x3x3
  Conv3d `last_layer` to RGB (vae_module.py:645-655,709-715).

TPU-first: channels-last layout throughout, stacked-layer `lax.scan`,
attention as one fused einsum chain (the sequence is short enough that the
MXU-friendly dense softmax beats a flash kernel here), conv-as-matmul patch
embedding, and XLA-native trilinear resize.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTVAEConfig:
    """Mirrors the reference ddconfig (checkpoint `config.json`)."""

    video_size: int = 256       # pretrain geometry (pos-embed table shape)
    video_length: int = 16
    patch_size: int = 8
    patch_length: int = 4
    in_chans: int = 3
    z_chans: int = 16
    double_z: bool = True
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 16         # head_dim must be divisible by 6 for rope
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    with_cls_token: bool = True
    ln_in_attn: bool = True
    use_rope: bool = True
    use_final_proj: bool = True
    norm_code: bool = False
    rope_ref_feat_shape: Tuple[int, int, int] = (4, 16, 16)
    scale_factor: float = 0.18215  # latent scaling (runtime_config)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def latent_size(self) -> int:
        return self.video_size // self.patch_size

    @property
    def latent_length(self) -> int:
        return self.video_length // self.patch_length

    @property
    def num_patches(self) -> int:
        return self.latent_length * self.latent_size * self.latent_size

    @property
    def cls_token_nums(self) -> int:
        return 1 if self.with_cls_token else 0

    @property
    def unpatch_channels(self) -> int:
        vol = self.patch_size * self.patch_size * self.patch_length
        return 4 if self.use_final_proj else self.embed_dim // vol


def tiny_vitvae_config() -> ViTVAEConfig:
    return ViTVAEConfig(video_size=16, video_length=4, patch_size=4,
                        patch_length=2, embed_dim=48, depth=2, num_heads=2,
                        z_chans=4)


# ---------------------------------------------------------------------------
# rotary tables (vae_module.py:55-201 in_pixels=False path)
# ---------------------------------------------------------------------------

def vitvae_rope_tables(feat_shape: Tuple[int, int, int], head_dim: int,
                       ref_feat_shape: Tuple[int, int, int],
                       temperature: float = 10000.0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(sin, cos) [S, 6*nb] for the (T, H, W) grid — freq_bands step=1,
    temporal axis uncentered / spatial centered (center_imgidx), eva rescale
    `t = x / f * r`, repeat_interleave(2)."""
    nb = head_dim // (len(feat_shape) * 2)
    assert nb > 0, f"head_dim {head_dim} too small for 3-axis rope"
    exp = np.arange(nb, dtype=np.float64) / nb
    bands = 1.0 / (temperature ** exp)

    axes = []
    for i, (s, r) in enumerate(zip(feat_shape, ref_feat_shape)):
        t = np.arange(s, dtype=np.float64)
        if i != 0:
            t = t - (s - 1) / 2.0
        t = t / s * r
        axes.append(t)
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    pos = grid[..., None] * bands                     # [T, H, W, 3, nb]
    pos = pos.reshape(-1, 3 * nb)
    sin = np.repeat(np.sin(pos), 2, axis=-1)
    cos = np.repeat(np.cos(pos), 2, axis=-1)
    return sin.astype(np.float32), cos.astype(np.float32)


def _apply_rot_interleaved(x: jax.Array, sin: jax.Array, cos: jax.Array
                           ) -> jax.Array:
    """x: [..., S, H, D]; sin/cos [S, rot] with rot <= D (interleaved pairs;
    reference rot(), vae_module.py:142-150). Dims past rot pass through."""
    rot = sin.shape[-1]
    xf = x.astype(jnp.float32)
    xr = xf[..., :rot]
    tail = xf[..., rot:]
    pairs = xr.reshape(*xr.shape[:-1], rot // 2, 2)
    rotated = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1)
    rotated = rotated.reshape(*xr.shape)
    s = sin[..., :, None, :]
    c = cos[..., :, None, :]
    out = xr * c + rotated * s
    return jnp.concatenate([out, tail], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _lin(key, i, o, dtype=jnp.float32, bias=True):
    k1, _ = jax.random.split(key)
    p = {"w": (jax.random.normal(k1, (i, o), jnp.float32)
               * (i**-0.5)).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((o,), dtype)
    return p


def _linear(p, x):
    out = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _ln_p(d):
    return {"w": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _vit_block_init(key, cfg: ViTVAEConfig):
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    p = {
        "qkv": _lin(ks[0], d, 3 * d, bias=cfg.qkv_bias),
        "proj": _lin(ks[1], d, d),
        "norm2": _ln_p(d),
        "fc1": _lin(ks[2], d, int(d * cfg.mlp_ratio)),
        "fc2": _lin(ks[3], int(d * cfg.mlp_ratio), d),
    }
    if not cfg.ln_in_attn:
        p["norm1"] = _ln_p(d)
    return p


def init_vitvae_params(key, cfg: ViTVAEConfig) -> Params:
    ks = jax.random.split(key, 12)
    d = cfg.embed_dim
    pin = cfg.patch_length * cfg.patch_size**2 * cfg.in_chans
    zc = cfg.z_chans * (2 if cfg.double_z else 1)
    n_tok = cfg.num_patches + cfg.cls_token_nums
    vol = cfg.patch_length * cfg.patch_size**2

    def tower(k, first, last):
        kb, kp, kc = jax.random.split(k, 3)
        blocks = [_vit_block_init(kk, cfg)
                  for kk in jax.random.split(kb, cfg.depth)]
        t = {
            **first,
            "pos_embed": (jax.random.normal(kp, (n_tok, d), jnp.float32)
                          * 0.02),
            "blocks": jax.tree.map(lambda *x: jnp.stack(x), *blocks),
            "norm": _ln_p(d),
            **last,
        }
        if cfg.with_cls_token:
            t["cls_token"] = jax.random.normal(kc, (d,), jnp.float32) * 0.02
        return t

    enc = tower(ks[0],
                {"patch": _lin(ks[1], pin, d)},
                {"last": _lin(ks[2], d, zc)})
    dec_last = {"last_conv": {
        "w": (jax.random.normal(ks[3],
                                (3, 3, 3, cfg.unpatch_channels, 3),
                                jnp.float32)
              * (27 * cfg.unpatch_channels) ** -0.5),
        "b": jnp.zeros((3,), jnp.float32)}}
    if cfg.use_final_proj:
        dec_last["final_proj"] = _lin(ks[4], d, cfg.unpatch_channels * vol)
        dec_last["final_norm"] = _ln_p(cfg.unpatch_channels * vol)
    dec = tower(ks[5], {"proj_in": _lin(ks[6], cfg.z_chans, d)}, dec_last)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _ln(p, x, eps=1e-5):
    from ...ops.norms import layer_norm

    return layer_norm(x, p["w"].astype(jnp.float32),
                      p["b"].astype(jnp.float32), eps)


def _manual_ln(x, eps=1e-5):
    """(x - mean) / (std + eps), BIASED std, eps on the std, no affine
    (reference ManualLayerNorm, vae_module.py:229-242)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True))
    return (xf - mean) / (std + eps)


def _vit_block(p, x, cfg: ViTVAEConfig, sin, cos):
    b, s, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    h = x if cfg.ln_in_attn else _ln(p["norm1"], x).astype(x.dtype)
    qkv = _linear(p["qkv"], h).reshape(b, s, 3, nh, hd)
    if cfg.ln_in_attn:
        qkv = _manual_ln(qkv).astype(x.dtype)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.use_rope:
        ncls = cfg.cls_token_nums
        q = jnp.concatenate(
            [q[:, :ncls],
             _apply_rot_interleaved(q[:, ncls:], sin, cos)], axis=1)
        k = jnp.concatenate(
            [k[:, :ncls],
             _apply_rot_interleaved(k[:, ncls:], sin, cos)], axis=1)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
    x = x + _linear(p["proj"], o)
    h = _ln(p["norm2"], x).astype(x.dtype)
    x = x + _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], h),
                                          approximate=False))
    return x


def _linear_resample_axis(x: jax.Array, axis: int, out_size: int
                          ) -> jax.Array:
    """torch F.interpolate(mode='*linear', align_corners=False,
    antialias=False) along one axis: half-pixel source coords, clamped,
    2-tap linear interpolation. (jax.image.resize anti-aliases on
    downscale, which torch does not — the pos-embed resize must match the
    reference exactly.)"""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) \
        * (in_size / out_size) - 0.5
    coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = (coords - lo.astype(jnp.float32))
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return xl * (1.0 - w) + xh * w


def _pos_embed_for(cfg: ViTVAEConfig, pos: jax.Array,
                   feat_shape: Tuple[int, int, int]) -> jax.Array:
    """Learnable table, trilinear-resized when the geometry differs from the
    pretrain geometry; cls row kept verbatim (resize_pos_embed,
    vae_module.py:400-406, forward:526-534)."""
    src = (cfg.latent_length, cfg.latent_size, cfg.latent_size)
    ncls = cfg.cls_token_nums
    if tuple(feat_shape) == src:
        return pos
    grid = pos[ncls:].reshape(*src, cfg.embed_dim).astype(jnp.float32)
    for ax, n in enumerate(feat_shape):
        grid = _linear_resample_axis(grid, ax, n)
    resized = grid.reshape(-1, cfg.embed_dim).astype(pos.dtype)
    return jnp.concatenate([pos[:ncls], resized], axis=0)


def _run_tower(p, cfg: ViTVAEConfig, tokens: jax.Array,
               feat_shape: Tuple[int, int, int]) -> jax.Array:
    """cls prepend + pos embed + block stack + final norm. tokens: [B,S,D]."""
    b = tokens.shape[0]
    if cfg.with_cls_token:
        cls = jnp.broadcast_to(p["cls_token"].astype(tokens.dtype)[None, None],
                               (b, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _pos_embed_for(cfg, p["pos_embed"], feat_shape
                                     ).astype(tokens.dtype)[None]
    if cfg.use_rope:
        sin_np, cos_np = vitvae_rope_tables(feat_shape, cfg.head_dim,
                                            cfg.rope_ref_feat_shape)
        sin, cos = jnp.asarray(sin_np), jnp.asarray(cos_np)
    else:
        sin = cos = None

    def blk(h, bp):
        return _vit_block(bp, h, cfg, sin, cos), None

    tokens, _ = jax.lax.scan(blk, tokens, p["blocks"])
    tokens = _ln(p["norm"], tokens).astype(tokens.dtype)
    return tokens[:, cfg.cls_token_nums:]


def _conv3d_same(p, x):
    """3x3x3 SAME conv, channels-last (decoder last_layer)."""
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"].astype(x.dtype)


class ViTVAE:
    """Functional ViT-VAE with jitted encode/decode per geometry."""

    def __init__(self, cfg: ViTVAEConfig = ViTVAEConfig(),
                 params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if cfg.use_rope:
            assert cfg.head_dim % 6 == 0, (
                f"use_rope needs head_dim divisible by 6 (3 axes x "
                f"interleaved pairs), got {cfg.head_dim}")
        if params is None:
            key = key if key is not None else jax.random.key(0)
            params = init_vitvae_params(key, cfg)
        self.params = params
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)
        self._encode_moments = jax.jit(self._encode_moments_impl)

    # latents: [B, T/pl, H/ps, W/ps, z]

    def _encode_moments_impl(self, params, x):
        cfg = self.cfg
        b, t, hh, ww, c = x.shape
        pl, ps = cfg.patch_length, cfg.patch_size
        gt, gh, gw = t // pl, hh // ps, ww // ps
        # conv-as-matmul patch embed: feature order (c, pl, ph, pw) matches
        # the Conv3d weight layout [D, C, pl, ph, pw] after permute
        xp = x.reshape(b, gt, pl, gh, ps, gw, ps, c)
        xp = xp.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
            b, gt * gh * gw, c * pl * ps * ps)
        h = _linear(params["encoder"]["patch"], xp)
        h = _run_tower(params["encoder"], cfg, h, (gt, gh, gw))
        out = _linear(params["encoder"]["last"], h)   # [B, S, 2z or z]
        out = out.reshape(b, gt, gh, gw, -1)
        if cfg.norm_code:
            outf = out.astype(jnp.float32)
            out = (outf / jnp.linalg.norm(outf, axis=-1, keepdims=True)
                   ).astype(out.dtype)
        return out

    def _encode_impl(self, params, x):
        out = self._encode_moments_impl(params, x)
        mu = out[..., : self.cfg.z_chans]
        return mu * self.cfg.scale_factor

    def _decode_impl(self, params, z):
        cfg = self.cfg
        b, gt, gh, gw, zc = z.shape
        pl, ps = cfg.patch_length, cfg.patch_size
        z = z / cfg.scale_factor
        h = _linear(params["decoder"]["proj_in"],
                    z.reshape(b, gt * gh * gw, zc))
        h = _run_tower(params["decoder"], cfg, h, (gt, gh, gw))
        if cfg.use_final_proj:
            h = _linear(params["decoder"]["final_proj"], h)
            h = _ln(params["decoder"]["final_norm"], h).astype(h.dtype)
        uc = cfg.unpatch_channels
        out = h.reshape(b, gt, gh, gw, pl, ps, ps, uc)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, gt * pl, gh * ps, gw * ps, uc)
        return _conv3d_same(params["decoder"]["last_conv"], out)

    def encode_moments(self, video: jax.Array) -> jax.Array:
        """Raw encoder output [B, gt, gh, gw, 2z] (mean | logvar) before
        scale_factor — the DiagonalGaussianDistribution parameters."""
        return self._encode_moments(self.params, video)

    def encode(self, video: jax.Array,
               rng: Optional[jax.Array] = None) -> jax.Array:
        """video [B, T, H, W, 3] in [-1, 1]; T==1 is expanded to patch_length
        frames (reference single-image path, vae_model.py:266-277). With rng,
        samples the posterior (sample_posterior=True); otherwise the mode."""
        if video.shape[1] == 1 and self.cfg.patch_length > 1:
            video = jnp.broadcast_to(
                video,
                (video.shape[0], self.cfg.patch_length, *video.shape[2:]))
            return self.encode(video, rng)[:, :1]
        if rng is None:
            return self._encode(self.params, video)
        mo = self.encode_moments(video)
        z = self.cfg.z_chans
        mean, logvar = mo[..., :z], jnp.clip(mo[..., z:], -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        return (mean + std * eps) * self.cfg.scale_factor

    def decode(self, latents: jax.Array) -> jax.Array:
        return jnp.clip(self._decode(self.params, latents), -1.0, 1.0)
