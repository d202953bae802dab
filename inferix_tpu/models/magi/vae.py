"""MAGI ViT-VAE in functional JAX.

Parity with the reference `ViTVAE` (`inferix/models/magi/vae/vae_model.py:220-340`,
`vae_module.py:409-620`): 3D-patch ViT encoder -> DiagonalGaussian latent ->
ViT decoder, spatial patch 8, temporal patch 4 (temporal_downsample_factor 4,
`4.5B_base_config.json`), single-frame inputs expanded to a 4-frame clip.
TPU-first: channels-last, stacked-layer scan, sin-cos positional embeddings
(the reference adds learnable pos embeds + rotary; the converter bakes
learned tables when loading real weights).
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
    patch_size: int = 8
    patch_length: int = 4
    in_chans: int = 3
    z_chans: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    scale_factor: float = 0.18215  # latent scaling (runtime_config)


def tiny_vitvae_config() -> ViTVAEConfig:
    return ViTVAEConfig(patch_size=4, patch_length=2, embed_dim=64, depth=2,
                        num_heads=4, z_chans=4)


def _lin(key, i, o, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w": (jax.random.normal(k1, (i, o), jnp.float32) * (i**-0.5)).astype(dtype),
        "b": jnp.zeros((o,), dtype),
    }


def _linear(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def _vit_block_init(key, cfg: ViTVAEConfig):
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    return {
        "norm1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "qkv": _lin(ks[0], d, 3 * d),
        "proj": _lin(ks[1], d, d),
        "norm2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "fc1": _lin(ks[2], d, int(d * cfg.mlp_ratio)),
        "fc2": _lin(ks[3], int(d * cfg.mlp_ratio), d),
    }


def _ln(p, x, eps=1e-5):
    from ...ops.norms import layer_norm

    return layer_norm(x, p["w"], p["b"], eps)


def _vit_block(p, x, nh):
    b, s, d = x.shape
    h = _ln(p["norm1"], x)
    qkv = _linear(p["qkv"], h).reshape(b, s, 3, nh, d // nh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * ((d // nh) ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
    x = x + _linear(p["proj"], o)
    h = _ln(p["norm2"], x)
    x = x + _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], h)))
    return x


def _sincos_pos_embed(n: int, dim: int) -> np.ndarray:
    pos = np.arange(n, dtype=np.float64)
    half = dim // 2
    freqs = np.power(10000.0, -np.arange(half, dtype=np.float64) / half)
    ang = np.outer(pos, freqs)
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)


class ViTVAE:
    """Functional ViT-VAE with jitted encode/decode per geometry."""

    def __init__(self, cfg: ViTVAEConfig = ViTVAEConfig(),
                 params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            key = key if key is not None else jax.random.key(0)
            ks = jax.random.split(key, 8)
            pin = cfg.patch_length * cfg.patch_size**2 * cfg.in_chans
            zout = cfg.patch_length * cfg.patch_size**2 * cfg.in_chans
            d = cfg.embed_dim
            enc_blocks = [_vit_block_init(k, cfg)
                          for k in jax.random.split(ks[0], cfg.depth)]
            dec_blocks = [_vit_block_init(k, cfg)
                          for k in jax.random.split(ks[1], cfg.depth)]
            params = {
                "enc_patch": _lin(ks[2], pin, d),
                "enc_blocks": jax.tree.map(lambda *x: jnp.stack(x), *enc_blocks),
                "enc_norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "enc_head": _lin(ks[3], d, 2 * cfg.z_chans),
                "dec_patch": _lin(ks[4], cfg.z_chans, d),
                "dec_blocks": jax.tree.map(lambda *x: jnp.stack(x), *dec_blocks),
                "dec_norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "dec_head": _lin(ks[5], d, zout),
            }
        self.params = params
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    # latents: [B, T/pl, H/ps, W/ps, z]

    def _encode_impl(self, params, x):
        cfg = self.cfg
        b, t, hh, ww, c = x.shape
        pl, ps = cfg.patch_length, cfg.patch_size
        gt, gh, gw = t // pl, hh // ps, ww // ps
        xp = x.reshape(b, gt, pl, gh, ps, gw, ps, c)
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, gt * gh * gw, pl * ps * ps * c)
        h = _linear(params["enc_patch"], xp)
        h = h + jnp.asarray(_sincos_pos_embed(h.shape[1], cfg.embed_dim))[None]

        def blk(hh_, p):
            return _vit_block(p, hh_, cfg.num_heads), None

        h, _ = jax.lax.scan(blk, h, params["enc_blocks"])
        h = _ln(params["enc_norm"], h)
        out = _linear(params["enc_head"], h)  # [B, S, 2z]
        mu = out[..., : cfg.z_chans]
        mu = mu.reshape(b, gt, gh, gw, cfg.z_chans)
        return mu * cfg.scale_factor

    def _decode_impl(self, params, z):
        cfg = self.cfg
        b, gt, gh, gw, zc = z.shape
        pl, ps = cfg.patch_length, cfg.patch_size
        z = z / cfg.scale_factor
        h = _linear(params["dec_patch"], z.reshape(b, gt * gh * gw, zc))
        h = h + jnp.asarray(_sincos_pos_embed(h.shape[1], cfg.embed_dim))[None]

        def blk(hh_, p):
            return _vit_block(p, hh_, cfg.num_heads), None

        h, _ = jax.lax.scan(blk, h, params["dec_blocks"])
        h = _ln(params["dec_norm"], h)
        out = _linear(params["dec_head"], h)
        out = out.reshape(b, gt, gh, gw, pl, ps, ps, cfg.in_chans)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return out.reshape(b, gt * pl, gh * ps, gw * ps, cfg.in_chans)

    def encode(self, video: jax.Array) -> jax.Array:
        """video [B, T, H, W, 3] in [-1, 1]; T==1 is expanded to patch_length
        frames (reference single-image path, vae_model.py:266-277)."""
        if video.shape[1] == 1 and self.cfg.patch_length > 1:
            video = jnp.broadcast_to(
                video, (video.shape[0], self.cfg.patch_length, *video.shape[2:])
            )
            return self._encode(self.params, video)[:, :1]
        return self._encode(self.params, video)

    def decode(self, latents: jax.Array) -> jax.Array:
        return jnp.clip(self._decode(self.params, latents), -1.0, 1.0)
