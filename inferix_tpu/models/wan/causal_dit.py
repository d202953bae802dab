"""Block-causal Wan DiT backbone in functional JAX.

Capability parity with the reference `CausalWanModel`
(`inferix/models/self_forcing/causal_model.py:518-1027`): patch embedding,
per-frame AdaLN time modulation, rope with start-frame offset, per-layer
self-attention over a rolling KV cache, cached text cross-attention, GELU-tanh
FFN, modulated output head, unpatchify — re-designed TPU-first:

* channels-last latents `[B, F, H, W, C]`; patch embed / unpatchify are
  reshapes + one matmul (MXU) instead of Conv3d.
* parameters are a pytree with all transformer layers STACKED on a leading
  `L` axis so the layer loop is a single `jax.lax.scan` (one compiled layer
  body, KV cache slices as scan xs/ys).
* the KV cache is the functional ring buffer of `inferix_tpu/kvcache/cache.py`;
  rolling-window + sink eviction is index arithmetic, not data movement.
* fp32 promotion points mirror the reference: time embeddings + modulation in
  fp32, norms accumulate fp32, attention softmax fp32.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.config import ModelConfig
from ...kvcache.cache import (
    CrossAttnCache,
    KVCache,
    KVCacheSpec,
    init_kv_cache,
    position_to_slot,
    valid_mask,
    write_block,
)
from ...ops.attention import cache_attention
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import RopeTables, apply_rope, build_rope_tables, rope_angles, sinusoidal_embedding_1d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _linear_init(key, in_dim, out_dim, dtype):
    wkey, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(wkey, (in_dim, out_dim), dtype=jnp.float32,
                                minval=-scale, maxval=scale).astype(dtype),
        "b": jnp.zeros((out_dim,), dtype=dtype),
    }


def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        from ...quant.api import quantized_linear

        return quantized_linear(p, x)
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def init_block_params(key, cfg: ModelConfig, dtype) -> Params:
    """One transformer block's parameters."""
    keys = jax.random.split(key, 12)
    d = cfg.dim
    return {
        "self_attn": {
            "q": _linear_init(keys[0], d, d, dtype),
            "k": _linear_init(keys[1], d, d, dtype),
            "v": _linear_init(keys[2], d, d, dtype),
            "o": _linear_init(keys[3], d, d, dtype),
            "norm_q": {"w": jnp.ones((d,), dtype)},
            "norm_k": {"w": jnp.ones((d,), dtype)},
        },
        "cross_attn": {
            "q": _linear_init(keys[4], d, d, dtype),
            "k": _linear_init(keys[5], d, d, dtype),
            "v": _linear_init(keys[6], d, d, dtype),
            "o": _linear_init(keys[7], d, d, dtype),
            "norm_q": {"w": jnp.ones((d,), dtype)},
            "norm_k": {"w": jnp.ones((d,), dtype)},
            **({
                "k_img": _linear_init(jax.random.fold_in(keys[5], 1), d, d, dtype),
                "v_img": _linear_init(jax.random.fold_in(keys[6], 1), d, d, dtype),
                "norm_k_img": {"w": jnp.ones((d,), dtype)},
            } if cfg.model_type == "i2v" else {}),
        },
        # norm3 is the affine LayerNorm before cross attention
        "norm3": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "ffn": {
            "fc1": _linear_init(keys[8], d, cfg.ffn_dim, dtype),
            "fc2": _linear_init(keys[9], cfg.ffn_dim, d, dtype),
        },
        "modulation": (jax.random.normal(keys[10], (6, d), jnp.float32)
                       / math.sqrt(d)).astype(jnp.float32),
    }


def init_params(key, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    """Full model parameters; transformer blocks stacked on leading L axis."""
    keys = jax.random.split(key, 8)
    d = cfg.dim
    patch_in = math.prod(cfg.patch_size) * cfg.in_dim
    patch_out = math.prod(cfg.patch_size) * cfg.out_dim

    block_keys = jax.random.split(keys[0], cfg.num_layers)
    blocks = [init_block_params(k, cfg, dtype) for k in block_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    params = {
        "patch_embedding": _linear_init(keys[1], patch_in, d, dtype),
        "text_embedding": {
            "fc1": _linear_init(keys[2], cfg.text_dim, d, dtype),
            "fc2": _linear_init(keys[3], d, d, dtype),
        },
        "time_embedding": {
            "fc1": _linear_init(keys[4], cfg.freq_dim, d, jnp.float32),
            "fc2": _linear_init(keys[5], d, d, jnp.float32),
        },
        "time_projection": _linear_init(keys[6], d, 6 * d, jnp.float32),
        "blocks": stacked,
        "head": {
            "head": _linear_init(keys[7], d, patch_out, dtype),
            "modulation": (jax.random.normal(jax.random.fold_in(keys[7], 1),
                                             (2, d), jnp.float32)
                           / math.sqrt(d)).astype(jnp.float32),
        },
    }
    if cfg.model_type == "i2v":
        ik = jax.random.fold_in(keys[1], 7)
        params["img_emb"] = {
            "norm1": {"w": jnp.ones((1280,), dtype), "b": jnp.zeros((1280,), dtype)},
            "fc1": _linear_init(jax.random.fold_in(ik, 0), 1280, 1280, dtype),
            "fc2": _linear_init(jax.random.fold_in(ik, 1), 1280, d, dtype),
            "norm2": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        }
    return params


def fuse_qkv_params(params: Params) -> Params:
    """Merge each block's self-attention q/k/v projections into one fused
    [D, 3D] projection so the hot path issues one MXU matmul per layer
    instead of three (measured ~3% of the layer's linear+elementwise time
    on v5e, exp/r2_fusedqkv.py). Numerically identical — the fused output
    is split back before the q/k RMS norms.

    Handles both bf16 leaves ({"w", "b"}) and quantized leaves
    ({"w_q", "scale", "b"}); a per-tensor scale is broadcast per-channel
    first so the three projections' scales can concatenate. Stacked-layer
    leading axes pass through (concat is on the last axis). No-op if the
    tree is already fused."""
    blocks = params.get("blocks")
    if blocks is None or "qkv" in blocks.get("self_attn", {}):
        return params
    sa = blocks["self_attn"]
    q, k, v = sa["q"], sa["k"], sa["v"]
    fused: Params = {}
    if "w" in q:
        fused["w"] = jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)
    else:
        fused["w_q"] = jnp.concatenate([q["w_q"], k["w_q"], v["w_q"]],
                                       axis=-1)

        def per_channel(p):
            s, wq = p["scale"], p["w_q"]
            return jnp.broadcast_to(s, s.shape[:-1] + (wq.shape[-1],))

        fused["scale"] = jnp.concatenate(
            [per_channel(q), per_channel(k), per_channel(v)], axis=-1)
    fused["b"] = jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)
    new_sa = {kk: vv for kk, vv in sa.items() if kk not in ("q", "k", "v")}
    new_sa["qkv"] = fused
    new_params = dict(params)
    new_params["blocks"] = dict(blocks)
    new_params["blocks"]["self_attn"] = new_sa
    return new_params


# ---------------------------------------------------------------------------
# Static geometry helper
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiTGeometry:
    """Static per-run shape info derived from config + latent size."""

    frames: int          # frames per forward call (block size)
    latent_h: int
    latent_w: int
    patch_size: Tuple[int, int, int]

    @property
    def grid_h(self) -> int:
        return self.latent_h // self.patch_size[1]

    @property
    def grid_w(self) -> int:
        return self.latent_w // self.patch_size[2]

    @property
    def frame_seq(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def tokens(self) -> int:
        return self.frames * self.frame_seq


def make_kv_spec(cfg: ModelConfig, batch: int, latent_h: int, latent_w: int,
                 dtype=jnp.bfloat16, quantized: bool = False,
                 kv_dtype=None, head_major: bool = False,
                 alloc_multiple: int = 0) -> KVCacheSpec:
    """kv_dtype overrides the cache storage dtype (e.g. float8_e4m3fn for
    the scale-free fp8 KV cache — half HBM, cast-only in-kernel dequant);
    quantized=True selects the int8 + per-(token, head)-scale cache;
    head_major=True stores the cache [L, B, H, S, D] so the flash kernels'
    fold is a free reshape (KVCacheSpec.head_major); alloc_multiple rounds
    the PHYSICAL slot count up to a multiple (the flash kernel's kv_block)
    so the kernel's per-layer K/V pad becomes a no-op
    (KVCacheSpec.alloc_tokens)."""
    geo = DiTGeometry(1, latent_h, latent_w, cfg.patch_size)
    frame_seq = geo.frame_seq
    window_frames = cfg.attention_window_frames
    max_tokens = window_frames * frame_seq
    alloc = (-(-max_tokens // alloc_multiple) * alloc_multiple
             if alloc_multiple else 0)
    return KVCacheSpec(
        alloc_tokens=alloc,
        num_layers=cfg.num_layers,
        batch=batch,
        max_tokens=max_tokens,
        num_kv_heads=cfg.num_heads,
        head_dim=cfg.head_dim,
        sink_tokens=cfg.sink_size * frame_seq,
        ring=(cfg.local_attn_size != -1),
        dtype=kv_dtype if kv_dtype is not None else dtype,
        quantized=quantized,
        head_major=head_major,
        # every pipeline write starts at a frame boundary and spans whole
        # frames, so ring writes lower to DUS pieces (see KVCacheSpec.granule)
        granule=frame_seq,
    )


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def patch_embed(params: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """x: [B, F, H, W, C] -> tokens [B, F*gh*gw, dim] (frame-major order,
    matching Conv3d(stride=patch) + flatten in the reference)."""
    b, f, h, w, c = x.shape
    pt, ph, pw = cfg.patch_size
    assert f % pt == 0 and h % ph == 0 and w % pw == 0
    x = x.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    # -> [B, f/pt, h/ph, w/pw, pt, ph, pw, c]
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    x = x.reshape(b, (f // pt) * (h // ph) * (w // pw), pt * ph * pw * c)
    return linear(params["patch_embedding"], x)


def unpatchify(x: jax.Array, cfg: ModelConfig, geo: DiTGeometry) -> jax.Array:
    """tokens [B, F*gh*gw, pt*ph*pw*out] -> [B, F, H, W, out]."""
    b = x.shape[0]
    pt, ph, pw = cfg.patch_size
    f, gh, gw = geo.frames // pt, geo.grid_h, geo.grid_w
    x = x.reshape(b, f, gh, gw, pt, ph, pw, cfg.out_dim)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, geo.frames, geo.latent_h, geo.latent_w, cfg.out_dim)


def time_embeddings(params: Params, cfg: ModelConfig,
                    t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """t: [B, F] int timesteps -> (e [B, F, dim], e0 [B, F, 6, dim]) fp32."""
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    e = linear(params["time_embedding"]["fc2"],
               jax.nn.silu(linear(params["time_embedding"]["fc1"], emb)))
    e0 = linear(params["time_projection"], jax.nn.silu(e))
    b, f = t.shape
    return e, e0.reshape(b, f, 6, cfg.dim)


def embed_text(params: Params, cfg: ModelConfig, context: jax.Array) -> jax.Array:
    """Project text-encoder features [B, text_len, text_dim] -> [B, text_len, dim]."""
    h = linear(params["text_embedding"]["fc1"], context)
    h = jax.nn.gelu(h, approximate=True)
    return linear(params["text_embedding"]["fc2"], h)


def precompute_crossattn_cache(
    params: Params, cfg: ModelConfig, context: jax.Array,
    clip_features: Optional[jax.Array] = None,
) -> CrossAttnCache:
    """Project text context through every layer's cross-attn K/V once per
    prompt (replaces the reference's lazy `is_init` crossattn cache,
    `wan_base/model.py:79-95`). For i2v models, clip_features [B, 257, 1280]
    are projected through img_emb (MLPProj) and each layer's k_img/v_img."""
    ctx = embed_text(params, cfg, context)
    b, s, d = ctx.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    def layer_kv(block):
        ca = block["cross_attn"]
        k = rms_norm(linear(ca["k"], ctx), ca["norm_k"]["w"], cfg.eps)
        v = linear(ca["v"], ctx)
        return k.reshape(b, s, nh, hd), v.reshape(b, s, nh, hd)

    k, v = jax.vmap(layer_kv)(params["blocks"])

    if cfg.model_type == "i2v" and clip_features is not None:
        ie = params["img_emb"]
        h = layer_norm(clip_features, ie["norm1"]["w"], ie["norm1"]["b"])
        h = jax.nn.gelu(linear(ie["fc1"], h), approximate=False)
        img_tokens = layer_norm(linear(ie["fc2"], h), ie["norm2"]["w"],
                                ie["norm2"]["b"])
        si = img_tokens.shape[1]

        def layer_img_kv(block):
            ca = block["cross_attn"]
            ki = rms_norm(linear(ca["k_img"], img_tokens),
                          ca["norm_k_img"]["w"], cfg.eps)
            vi = linear(ca["v_img"], img_tokens)
            return ki.reshape(b, si, nh, hd), vi.reshape(b, si, nh, hd)

        k_img, v_img = jax.vmap(layer_img_kv)(params["blocks"])
        return CrossAttnCache(k=k, v=v, k_img=k_img, v_img=v_img)
    return CrossAttnCache(k=k, v=v)


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------

def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array,
              frames: int) -> jax.Array:
    """Per-frame AdaLN: x [B, S, C] with S = frames*frame_seq, shift/scale
    [B, F, C] broadcast over each frame's tokens."""
    b, s, c = x.shape
    x = x.reshape(b, frames, s // frames, c)
    out = x * (1.0 + scale[:, :, None, :]).astype(x.dtype) \
        + shift[:, :, None, :].astype(x.dtype)
    return out.reshape(b, s, c)


def _gate(x: jax.Array, gate: jax.Array, frames: int) -> jax.Array:
    b, s, c = x.shape
    x = x.reshape(b, frames, s // frames, c)
    out = x * gate[:, :, None, :].astype(x.dtype)
    return out.reshape(b, s, c)


def block_forward(
    block: Params,
    cfg: ModelConfig,
    spec: KVCacheSpec,
    x: jax.Array,              # [B, S, C]
    e0: jax.Array,             # [B, F, 6, C] fp32
    angles: jax.Array,         # [S, head_dim//2] rope angles for this block
    layer_cache: tuple,        # (k, v) or (k, v, k_scale, v_scale) per layer
    xattn_k: jax.Array,        # [B, text_len, H, D]
    xattn_v: jax.Array,
    xattn_img: Optional[tuple],  # (k_img, v_img) for i2v, else None
    current_start: jax.Array,  # scalar int32, token offset of this block
    kv_mask: jax.Array,        # [Smax] bool — valid cache slots after write
    mesh=None,                 # sp>1: shard_map distributed attention
    sp_mode: str = "none",
    max_span: Optional[int] = None,  # static bound on the live prefix — see
                                     # flash_attention_prefix(max_span)
) -> Tuple[jax.Array, tuple]:
    b, s, c = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    frames = e0.shape[1]

    mod = block["modulation"][None] + e0  # [B, F, 6, C] fp32
    shift_msa, scale_msa, gate_msa = mod[:, :, 0], mod[:, :, 1], mod[:, :, 2]
    shift_mlp, scale_mlp, gate_mlp = mod[:, :, 3], mod[:, :, 4], mod[:, :, 5]

    # --- self attention over KV cache ---
    from ...quant.api import (quantized_linear_prequant, use_fused_prologue)

    sa = block["self_attn"]
    lead_p = sa["qkv"] if "qkv" in sa else sa["q"]
    # the fused Pallas prologues cannot be GSPMD-auto-partitioned: gate them
    # off whenever a multi-device mesh drives this forward (multi-chip runs
    # keep the XLA chain; the Pallas attention already lives in shard_map
    # islands for the same reason)
    single_dev = mesh is None or mesh.devices.size == 1
    if single_dev and use_fused_prologue(lead_p, x):
        # fused LN+modulate+quant prologue (ops/act_quant.py): the bf16
        # modulated tensor never round-trips HBM before the int8 matmul
        from ...quant.api import adaln_quant

        h_q, h_s = adaln_quant(x, shift_msa, scale_msa, cfg.eps)
        if "qkv" in sa:
            qkv = quantized_linear_prequant(sa["qkv"], h_q, h_s, x.dtype)
            q_p, k_p, v_p = jnp.split(qkv, 3, axis=-1)
        else:
            q_p = quantized_linear_prequant(sa["q"], h_q, h_s, x.dtype)
            k_p = quantized_linear_prequant(sa["k"], h_q, h_s, x.dtype)
            v_p = quantized_linear_prequant(sa["v"], h_q, h_s, x.dtype)
    else:
        h_in = _modulate(layer_norm(x, eps=cfg.eps), shift_msa, scale_msa,
                         frames)
        if "qkv" in sa:
            # fused projection (see fuse_qkv_params): one [D, 3D] matmul
            qkv = linear(sa["qkv"], h_in)
            q_p, k_p, v_p = jnp.split(qkv, 3, axis=-1)
        else:
            q_p = linear(sa["q"], h_in)
            k_p = linear(sa["k"], h_in)
            v_p = linear(sa["v"], h_in)
    q = rms_norm(q_p, sa["norm_q"]["w"], cfg.eps)
    k = rms_norm(k_p, sa["norm_k"]["w"], cfg.eps)
    v = v_p.reshape(b, s, nh, hd)
    q = apply_rope(q.reshape(b, s, nh, hd), angles)
    k = apply_rope(k.reshape(b, s, nh, hd), angles)

    use_sp = (mesh is not None and sp_mode != "none"
              and mesh.shape.get("sp", 1) > 1)
    kv_layout = "bhsd" if spec.head_major else "bshd"
    if spec.quantized:
        k_c, v_c, ks_c, vs_c = write_block(
            spec, layer_cache[0], layer_cache[1], k, v, current_start,
            layer_cache[2], layer_cache[3],
        )
        if use_sp:
            # sp x int8-KV composition: the island shards the int8 cache
            # (ulysses: heads over (tp, sp); ring: tokens over sp) and the
            # scales ride along on the same axis — the 24B-class serving
            # point needs sp-sharded windows AND the halved-HBM cache at
            # the same time (VERDICT round-2 weak #3).
            from ...parallel.distributed_attention import sp_cache_attention

            attn = sp_cache_attention(mesh, sp_mode, q, k_c, v_c, kv_mask,
                                      k_scales=ks_c, v_scales=vs_c,
                                      kv_layout=kv_layout)
        else:
            attn = cache_attention(q, k_c, v_c, kv_mask=kv_mask,
                                   k_scale=ks_c, v_scale=vs_c,
                                   max_span=max_span, kv_layout=kv_layout,
                                   logical_kv=spec.max_tokens)
        new_cache = (k_c, v_c, ks_c, vs_c)
    else:
        k_c, v_c = write_block(
            spec, layer_cache[0], layer_cache[1], k, v, current_start
        )
        if use_sp:
            from ...parallel.distributed_attention import sp_cache_attention

            attn = sp_cache_attention(mesh, sp_mode, q, k_c, v_c, kv_mask,
                                      kv_layout=kv_layout)
        else:
            attn = cache_attention(q, k_c, v_c, kv_mask=kv_mask,
                                   max_span=max_span, kv_layout=kv_layout,
                                   logical_kv=spec.max_tokens)
        new_cache = (k_c, v_c)
    y = linear(sa["o"], attn.reshape(b, s, c))
    x = x + _gate(y, gate_msa, frames)

    # --- cross attention (cached text K/V; + image K/V for i2v) ---
    ca = block["cross_attn"]
    if single_dev and use_fused_prologue(ca["q"], x):
        from ...quant.api import ln_quant

        w3 = block["norm3"]["w"] if cfg.cross_attn_norm else None
        b3 = block["norm3"]["b"] if cfg.cross_attn_norm else None
        hq2, hs2 = ln_quant(x.reshape(b * s, c), w3, b3, cfg.eps)
        cq = quantized_linear_prequant(ca["q"], hq2, hs2, x.dtype)
        cq = cq.reshape(b, s, c)
    else:
        h_x = layer_norm(x, block["norm3"]["w"], block["norm3"]["b"], cfg.eps) \
            if cfg.cross_attn_norm else layer_norm(x, eps=cfg.eps)
        cq = linear(ca["q"], h_x)
    cq = rms_norm(cq, ca["norm_q"]["w"], cfg.eps)
    cq = cq.reshape(b, s, nh, hd)
    xa = cache_attention(cq, xattn_k, xattn_v)
    if xattn_img is not None:
        # i2v: separate image attention summed with text attention
        # (reference WanI2VCrossAttention, wan_base/model.py:118-141)
        xa = xa + cache_attention(cq, xattn_img[0], xattn_img[1])
    x = x + linear(ca["o"], xa.reshape(b, s, c))

    # --- FFN ---
    # quantized_ffn folds the gelu into fc2's activation-quant pass when the
    # fused act-quant kernel is enabled (never materializes the bf16 gelu
    # tensor); identical to linear(fc2, gelu(linear(fc1, h))) otherwise.
    from ...quant.api import quantized_ffn

    if single_dev and use_fused_prologue(block["ffn"]["fc1"], x):
        from ...quant.api import adaln_quant

        hq3, hs3 = adaln_quant(x, shift_mlp, scale_mlp, cfg.eps)
        y = quantized_ffn(block["ffn"]["fc1"], block["ffn"]["fc2"],
                          x_q=hq3, x_scale=hs3, out_dtype=x.dtype)
    else:
        h_f = _modulate(layer_norm(x, eps=cfg.eps), shift_mlp, scale_mlp,
                        frames)
        y = quantized_ffn(block["ffn"]["fc1"], block["ffn"]["fc2"], h_f)
    x = x + _gate(y, gate_mlp, frames)
    return x, new_cache


def head_forward(params: Params, cfg: ModelConfig, x: jax.Array,
                 e: jax.Array) -> jax.Array:
    """Output head with 2-way modulation; e: [B, F, C] fp32."""
    frames = e.shape[1]
    mod = params["head"]["modulation"][None, None] + e[:, :, None, :]  # [B,F,2,C]
    shift, scale = mod[:, :, 0], mod[:, :, 1]
    h = _modulate(layer_norm(x, eps=cfg.eps), shift, scale, frames)
    return linear(params["head"]["head"], h)


# ---------------------------------------------------------------------------
# Full forward (inference with KV cache)
# ---------------------------------------------------------------------------

class DiTStatics(NamedTuple):
    """Host-side constants bundled for the forward pass.

    mesh + sp_mode select the in-forward distributed attention path
    (`parallel/distributed_attention.py` — the reference's CoreAttention CP
    path): when the mesh's sp axis > 1, self-attention over the cache runs
    as a shard_map island (ulysses a2a or ring pass-q) instead of the local
    kernel."""

    cfg: ModelConfig
    spec: KVCacheSpec
    geo: DiTGeometry
    mesh: Optional[Any] = None
    sp_mode: str = "none"


def make_statics(cfg: ModelConfig, batch: int, frames: int, latent_h: int,
                 latent_w: int, dtype=jnp.bfloat16,
                 quantized_kv: bool = False, mesh=None,
                 sp_mode: str = "none", kv_dtype=None,
                 kv_head_major: bool = False,
                 kv_alloc_multiple: int = 0) -> DiTStatics:
    return DiTStatics(
        cfg=cfg,
        spec=make_kv_spec(cfg, batch, latent_h, latent_w, dtype, quantized_kv,
                          kv_dtype=kv_dtype, head_major=kv_head_major,
                          alloc_multiple=kv_alloc_multiple),
        geo=DiTGeometry(frames, latent_h, latent_w, cfg.patch_size),
        mesh=mesh,
        sp_mode=sp_mode,
    )


def dit_forward_inference(
    params: Params,
    statics: DiTStatics,
    rope_tables: RopeTables,
    x: jax.Array,               # [B, F, H, W, C] noisy latents for this block
    t: jax.Array,               # [B, F] int32 timesteps
    xattn: CrossAttnCache,      # [L, B, text_len, H, D] x2
    cache: KVCache,             # [L, B, Smax, H, D] x2
    current_start: jax.Array,   # scalar int32 token offset
    persist_kv: bool = True,    # False: attend against the block's fresh KV
                                # but do NOT write it back (denoise steps
                                # rewrite it next step anyway — only the
                                # context re-run must persist)
    need_output: bool = True,   # False: skip the output head/unpatchify
                                # (context re-runs only feed the KV cache)
    max_span: Optional[int] = None,  # static bound on the live cache prefix
                                # (tokens) — span-sized Pallas grids; the
                                # pipeline passes a bucketed host bound per
                                # block (RuntimeConfig.span_grid)
) -> Tuple[jax.Array, KVCache]:
    """One forward pass of the causal DiT over a block, updating the KV cache.

    Returns (flow_pred [B, F, H, W, out_dim], new_cache). The layer loop is a
    lax.scan over stacked block params + per-layer cache slices.
    """
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    tokens = patch_embed(params, cfg, x)        # [B, S, C]
    e, e0 = time_embeddings(params, cfg, t)     # fp32

    # current_start: scalar (whole batch at one position) or [B]
    # (continuous batching — each stream at its own block)
    current_start = jnp.asarray(current_start, jnp.int32)
    start_frame = current_start // geo.frame_seq
    if current_start.ndim == 1:
        angles = jax.vmap(
            lambda s0: rope_angles(rope_tables, geo.frames, geo.grid_h,
                                   geo.grid_w, s0)
        )(start_frame)                           # [B, S, D//2]
    else:
        angles = rope_angles(rope_tables, geo.frames, geo.grid_h, geo.grid_w,
                             start_frame)
    current_end = current_start + geo.tokens
    kv_mask = valid_mask(spec, current_end)      # [S] or [B, S]

    # The full cache arrays ride the scan CARRY and each layer's slice is
    # updated with dynamic_update_index_in_dim — carry updates bufferize
    # in-place, whereas emitting per-layer caches as stacked scan outputs (ys)
    # forces XLA to allocate a second full cache (an extra 2x2.8 GB for the
    # 1.3B model: OOM on a 16 GB chip).
    cache_fields = [f for f in (cache.k, cache.v, cache.k_scale, cache.v_scale)
                    if f is not None]
    n_fields = len(cache_fields)
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    has_img = xattn.k_img is not None

    def layer(carry, xs):
        # persist_kv=False: the cache is NOT part of the carry — it is closed
        # over as a loop-invariant input. A pass-through carry defeats XLA's
        # input/output donation aliasing (the while-loop carry buffer must be
        # materialized separately), which costs a full extra cache copy in
        # HBM — 2x3.21 GB at int8 B=4, the difference between fitting 4
        # streams on a 16 GB chip and OOM.
        if persist_kv:
            h, caches = carry
        else:
            h = carry
            caches = tuple(cache_fields)
        if has_img:
            block, xk, xv, xki, xvi, lid = xs
            img = (xki, xvi)
        else:
            block, xk, xv, lid = xs
            img = None
        layer_cache = tuple(
            jax.lax.dynamic_index_in_dim(c, lid, 0, keepdims=False)
            for c in caches
        )
        h, new_layer_cache = block_forward(
            block, cfg, spec, h, e0, angles, layer_cache, xk, xv, img,
            current_start, kv_mask, mesh=statics.mesh,
            sp_mode=statics.sp_mode, max_span=max_span,
        )
        if not persist_kv:
            return h, None
        caches = tuple(
            jax.lax.dynamic_update_index_in_dim(c, nc.astype(c.dtype),
                                                lid, 0)
            for c, nc in zip(caches, new_layer_cache)
        )
        return (h, caches), None

    use_pp_pipeline = (
        statics.mesh is not None
        and statics.mesh.shape.get("pp", 1) > 1
        and statics.sp_mode == "none"      # sp islands don't nest inside
        and not cfg.unroll_layers          # the pp shard_map
    )
    if use_pp_pipeline:
        # REAL pipeline parallelism: layers (params, xattn AND cache) are
        # sharded over pp; batch rows stream through the stages as GPipe
        # microbatches with stage-local compute
        # (parallel/pipeline_parallel.py). With sp/tp sharding use GSPMD or
        # the sp attention islands instead of pipelining.
        from ...parallel.pipeline_parallel import pp_pipeline

        b = tokens.shape[0]
        per_b_angles = angles.ndim == 3
        per_b_mask = kv_mask.ndim == 2
        per_b_start = current_start.ndim == 1
        mb = {"h": tokens[:, None], "e0": e0[:, None]}
        if per_b_angles:
            mb["angles"] = angles[:, None]
        if per_b_mask:
            mb["mask"] = kv_mask[:, None]
        if per_b_start:
            mb["start"] = current_start[:, None]
        stacked = {"block": params["blocks"], "xk": xattn.k, "xv": xattn.v}
        if has_img:
            stacked["xki"] = xattn.k_img
            stacked["xvi"] = xattn.v_img
        state = {f"c{i}": f for i, f in enumerate(cache_fields)}

        def pp_layer_fn(stk, st, x, mb_idx):
            def row(a):
                return jax.lax.dynamic_slice_in_dim(a, mb_idx, 1, 0)

            img = ((row(stk["xki"]), row(stk["xvi"])) if has_img else None)
            layer_cache = tuple(
                row(st[f"c{i}"]) for i in range(n_fields)
            )
            h_row, new_cache = block_forward(
                stk["block"], cfg, spec, x["h"],
                x["e0"],
                x["angles"] if per_b_angles else angles,
                layer_cache, row(stk["xk"]), row(stk["xv"]), img,
                x["start"][:, 0] if per_b_start else current_start,
                x["mask"] if per_b_mask else kv_mask,
            )
            if persist_kv:
                st = {
                    f"c{i}": jax.lax.dynamic_update_slice_in_dim(
                        st[f"c{i}"],
                        new_cache[i].astype(st[f"c{i}"].dtype), mb_idx, 0)
                    for i in range(n_fields)
                }
            return {**x, "h": h_row}, st

        outs, new_state = pp_pipeline(
            statics.mesh, pp_layer_fn, stacked, mb,
            layer_state=state, pass_mb_index=True,
        )
        h = outs["h"][:, 0]
        new_fields = tuple(new_state[f"c{i}"] for i in range(n_fields))
    elif cfg.unroll_layers:
        # static per-layer indices: XLA lowers leading-axis slice/update to
        # pointer arithmetic + in-place DUS (no 2x93MB copies per layer)
        h = tokens
        caches = tuple(cache_fields)
        for lid in range(cfg.num_layers):
            block = jax.tree.map(lambda a: a[lid], params["blocks"])
            img = ((xattn.k_img[lid], xattn.v_img[lid]) if has_img else None)
            layer_cache = tuple(c[lid] for c in caches)
            h, new_layer_cache = block_forward(
                block, cfg, spec, h, e0, angles, layer_cache,
                xattn.k[lid], xattn.v[lid], img, current_start, kv_mask,
                mesh=statics.mesh, sp_mode=statics.sp_mode,
            )
            if persist_kv:
                caches = tuple(
                    c.at[lid].set(nc.astype(c.dtype))
                    for c, nc in zip(caches, new_layer_cache)
                )
        new_fields = caches
    else:
        if has_img:
            xs = (params["blocks"], xattn.k, xattn.v, xattn.k_img,
                  xattn.v_img, layer_ids)
        else:
            xs = (params["blocks"], xattn.k, xattn.v, layer_ids)
        if persist_kv:
            (h, new_fields), _ = jax.lax.scan(
                layer, (tokens, tuple(cache_fields)), xs)
        else:
            h, _ = jax.lax.scan(layer, tokens, xs)
            new_fields = tuple(cache_fields)

    if need_output:
        out = head_forward(params, cfg, h, e)
        flow = unpatchify(out, cfg, geo)
    else:
        # context re-runs only write the cache; skip the head matmul +
        # unpatchify (the caller discards flow)
        flow = jnp.zeros(
            x.shape[:-1] + (cfg.out_dim,), dtype=x.dtype)
    if spec.quantized:
        new = KVCache(k=new_fields[0], v=new_fields[1],
                      k_scale=new_fields[2], v_scale=new_fields[3])
    else:
        new = KVCache(k=new_fields[0], v=new_fields[1])
    return flow, new


def dit_forward_bidirectional(
    params: Params,
    cfg: ModelConfig,
    rope_tables: RopeTables,
    x: jax.Array,               # [B, F, H, W, C] full clip
    t: jax.Array,               # [B, F]
    xattn: CrossAttnCache,
    dtype=jnp.float32,
) -> jax.Array:
    """Non-causal Wan forward (the wan_base `WanBaseModel` path used by
    standard bidirectional diffusion, `inferix/models/wan_base/model.py:202`):
    every token attends to the whole clip. Implemented as one inference call
    whose KV 'cache' is exactly the clip — with current_start=0 and the full
    clip as the block, the prefix mask covers all tokens, i.e. full
    bidirectional attention. No state survives the call."""
    b, f, hh, ww, c = x.shape
    statics = make_statics(cfg, b, f, hh, ww, dtype)
    # cache sized to the clip
    spec = KVCacheSpec(
        num_layers=cfg.num_layers, batch=b,
        max_tokens=statics.geo.tokens, num_kv_heads=cfg.num_heads,
        head_dim=cfg.head_dim, dtype=dtype,
    )
    statics = DiTStatics(cfg=cfg, spec=spec, geo=statics.geo)
    cache = init_kv_cache(spec)
    flow, _ = dit_forward_inference(
        params, statics, rope_tables, x, t, xattn, cache, jnp.int32(0)
    )
    return flow


def dit_forward_block_causal(
    params: Params,
    cfg: ModelConfig,
    rope_tables: RopeTables,
    x: jax.Array,               # [B, F, H, W, C] full clip
    t: jax.Array,               # [B, F]
    xattn: CrossAttnCache,
    frames_per_block: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Full-sequence block-causal forward (the reference's whole-sequence
    training/teacher-forcing path, `causal_model.py:660-864` flex-attention
    block masks + `_forward_train` :1028): every block attends to itself and
    all earlier blocks. Expressed with the same cache machinery — blocks are
    forwarded in order into a clip-sized cache inside one traced function, so
    the mask IS the prefix-validity mask and no mask tensors exist."""
    b, f = x.shape[0], x.shape[1]
    assert f % frames_per_block == 0
    n_blocks = f // frames_per_block

    statics = make_statics(cfg, b, frames_per_block, x.shape[2], x.shape[3],
                           dtype)
    spec = KVCacheSpec(
        num_layers=cfg.num_layers, batch=b,
        max_tokens=f * statics.geo.frame_seq,
        num_kv_heads=cfg.num_heads, head_dim=cfg.head_dim, dtype=dtype,
    )
    statics = DiTStatics(cfg=cfg, spec=spec, geo=statics.geo)
    cache = init_kv_cache(spec)
    flows = []
    for bi in range(n_blocks):
        sl = slice(bi * frames_per_block, (bi + 1) * frames_per_block)
        flow, cache = dit_forward_inference(
            params, statics, rope_tables, x[:, sl], t[:, sl], xattn, cache,
            jnp.int32(bi * frames_per_block * statics.geo.frame_seq),
        )
        flows.append(flow)
    return jnp.concatenate(flows, axis=1)


def dit_forward_teacher_forcing(
    params: Params,
    cfg: ModelConfig,
    rope_tables: RopeTables,
    noisy: jax.Array,           # [B, F, H, W, C]
    clean: jax.Array,           # [B, F, H, W, C] ground-truth context
    t: jax.Array,               # [B, F] timesteps of the noisy blocks
    xattn: CrossAttnCache,
    frames_per_block: int,
    context_noise: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Teacher forcing (reference `_forward_train` with clean_x,
    `causal_model.py:1028`): noisy block i attends to the CLEAN versions of
    blocks < i plus itself. The clean prefix is written into the cache at
    context noise level before each noisy block's forward."""
    b, f = noisy.shape[0], noisy.shape[1]
    assert f % frames_per_block == 0
    n_blocks = f // frames_per_block

    statics = make_statics(cfg, b, frames_per_block, noisy.shape[2],
                           noisy.shape[3], dtype)
    spec = KVCacheSpec(
        num_layers=cfg.num_layers, batch=b,
        max_tokens=f * statics.geo.frame_seq,
        num_kv_heads=cfg.num_heads, head_dim=cfg.head_dim, dtype=dtype,
    )
    statics = DiTStatics(cfg=cfg, spec=spec, geo=statics.geo)
    cache = init_kv_cache(spec)
    t_ctx = jnp.full((b, frames_per_block), context_noise, jnp.float32)
    flows = []
    for bi in range(n_blocks):
        sl = slice(bi * frames_per_block, (bi + 1) * frames_per_block)
        start = jnp.int32(bi * frames_per_block * statics.geo.frame_seq)
        # noisy block forward against the clean prefix (overwrites its own
        # slots with noisy KV only for the duration of this step)
        flow, _ = dit_forward_inference(
            params, statics, rope_tables, noisy[:, sl], t[:, sl], xattn,
            cache, start,
        )
        flows.append(flow)
        # then persist the clean block's KV for subsequent blocks
        _, cache = dit_forward_inference(
            params, statics, rope_tables, clean[:, sl], t_ctx, xattn, cache,
            start,
        )
    return jnp.concatenate(flows, axis=1)
