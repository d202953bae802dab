"""MAGI-1 VideoDiT (ardf) in functional JAX.

Capability parity with the reference `VideoDiTModel`
(`inferix/models/magi/dit/dit_model.py:114-671`, `dit_module.py:833-1391`):
chunk-windowed autoregressive-diffusion DiT with GQA attention, per-chunk
timestep conditioning (the reference's `range_mod_triton` per-range AdaLN,
dit_module.py:205-294), per-chunk caption cross-attention, chunk-causal
attention with per-chunk KV ranges (default full-prefix or noise2clean
shrinking windows), and a velocity output head.

TPU-first redesign:
* chunks are uniform (chunk_width x frame_seq tokens), so the reference's
  packed q/k ranges + flex-flash-attention collapse into regular reshapes:
  per-range modulation is a [B, n_chunks, ...] broadcast, and chunk-causal
  attention is one prefix-span flash call per window chunk (<= window_size+1
  static calls) against the same ring-buffer KV cache as the Wan family.
* GQA: kv heads are repeated to query heads at the attention call (the MXU
  matmul is query-bound; KV stays 8-head in cache/HBM, preserving the
  bandwidth advantage).
* 4.5B shapes (example/magi/configs/4.5B): 34 layers, hidden 3072, 24 q heads,
  8 kv groups, head_dim 128, ffn 12288, caption 4096 x 800, patch 2, chunk 6.

Differences noted for checkpoint parity: the reference uses a learnable
rotary embedding (rescaleable); here rope tables are fixed 3D — the converter
can bake learned frequencies into the tables when loading real weights.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...kvcache.cache import KVCache, KVCacheSpec, init_kv_cache, valid_mask, write_block
from ...ops.attention import cache_attention
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import RopeTables, apply_rope, build_rope_tables, rope_angles, sinusoidal_embedding_1d

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MagiModelConfig:
    num_layers: int = 34
    hidden_size: int = 3072
    ffn_hidden_size: int = 12288
    num_attention_heads: int = 24
    num_query_groups: int = 8       # GQA kv heads
    kv_channels: int = 128          # head dim
    layernorm_epsilon: float = 1e-6
    apply_layernorm_1p: bool = True  # weight parameterized as (1 + w)
    patch_size: int = 2
    t_patch_size: int = 1
    in_channels: int = 16
    out_channels: int = 16
    cond_hidden_ratio: float = 0.25
    caption_channels: int = 4096
    caption_max_length: int = 800
    chunk_width: int = 6
    rope_max_seq_len: int = 1024

    @property
    def cond_dim(self) -> int:
        return int(self.hidden_size * self.cond_hidden_ratio)


def tiny_magi_config() -> MagiModelConfig:
    return MagiModelConfig(
        num_layers=2, hidden_size=128, ffn_hidden_size=256,
        num_attention_heads=4, num_query_groups=2, kv_channels=32,
        caption_channels=64, caption_max_length=8, chunk_width=2,
        rope_max_seq_len=64,
    )


@dataclasses.dataclass(frozen=True)
class MagiGeometry:
    latent_h: int
    latent_w: int
    chunk_width: int
    patch: int

    @property
    def grid_h(self) -> int:
        return self.latent_h // self.patch

    @property
    def grid_w(self) -> int:
        return self.latent_w // self.patch

    @property
    def frame_seq(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def chunk_tokens(self) -> int:
        return self.chunk_width * self.frame_seq


class MagiStatics(NamedTuple):
    cfg: MagiModelConfig
    spec: KVCacheSpec
    geo: MagiGeometry


def make_magi_statics(cfg: MagiModelConfig, batch: int, latent_h: int,
                      latent_w: int, max_chunks: int,
                      dtype=jnp.bfloat16) -> MagiStatics:
    geo = MagiGeometry(latent_h, latent_w, cfg.chunk_width, cfg.patch_size)
    spec = KVCacheSpec(
        num_layers=cfg.num_layers,
        batch=batch,
        max_tokens=max_chunks * geo.chunk_tokens,
        num_kv_heads=cfg.num_query_groups,
        head_dim=cfg.kv_channels,
        dtype=dtype,
    )
    return MagiStatics(cfg=cfg, spec=spec, geo=geo)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _lin(key, i, o, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5)).astype(dtype)}
    p["b"] = jnp.zeros((o,), dtype) if bias else jnp.zeros((o,), dtype)
    return p


def init_magi_params(key, cfg: MagiModelConfig, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, 10)
    h = cfg.hidden_size
    hd = cfg.kv_channels
    q_dim = cfg.num_attention_heads * hd
    kv_dim = cfg.num_query_groups * hd
    cond = cfg.cond_dim
    patch_in = cfg.t_patch_size * cfg.patch_size**2 * cfg.in_channels
    patch_out = cfg.t_patch_size * cfg.patch_size**2 * cfg.out_channels

    def block(k):
        ks = jax.random.split(k, 10)
        return {
            "self_attn": {
                "q": _lin(ks[0], h, q_dim, dtype),
                "k": _lin(ks[1], h, kv_dim, dtype),
                "v": _lin(ks[2], h, kv_dim, dtype),
                "o": _lin(ks[3], q_dim, h, dtype),
                "norm_q": {"w": jnp.ones((q_dim,), dtype)},
                "norm_k": {"w": jnp.ones((kv_dim,), dtype)},
            },
            "cross_attn": {
                "q": _lin(ks[4], h, q_dim, dtype),
                "k": _lin(ks[5], h, kv_dim, dtype),
                "v": _lin(ks[6], h, kv_dim, dtype),
                "o": _lin(ks[7], q_dim, h, dtype),
            },
            "ffn": {
                "fc1": _lin(ks[8], h, cfg.ffn_hidden_size, dtype),
                "fc2": _lin(ks[9], cfg.ffn_hidden_size, h, dtype),
            },
            # per-range AdaLN projections (reference ada modulation via
            # range_mod: 6 gates/shifts/scales from the chunk's condition)
            "ada": _lin(jax.random.fold_in(k, 99), cond, 6 * h, jnp.float32),
            "norm1": {"w": jnp.zeros((h,), dtype)},   # 1p: effective 1+w
            "norm2": {"w": jnp.zeros((h,), dtype)},
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "patch_embed": _lin(keys[1], patch_in, h, dtype),
        "t_embedder": {
            "fc1": _lin(keys[2], 256, cond, jnp.float32),
            "fc2": _lin(keys[3], cond, cond, jnp.float32),
        },
        "y_embedder": {
            "fc1": _lin(keys[4], cfg.caption_channels, h, dtype),
            "fc2": _lin(keys[5], h, h, dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm": {"w": jnp.zeros((h,), dtype)},
        "final_linear": _lin(keys[6], h, patch_out, dtype),
        "final_ada": _lin(keys[7], cond, 2 * h, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _linear(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def _ln1p(p, x, eps):
    w = 1.0 + p["w"].astype(jnp.float32)
    return layer_norm(x, w, eps=eps)


def _patchify(cfg: MagiModelConfig, geo: MagiGeometry, x: jax.Array) -> jax.Array:
    """x: [B, T, H, W, C] -> [B, T*gh*gw, patch_in]."""
    b, t, hh, ww, c = x.shape
    p = cfg.patch_size
    x = x.reshape(b, t, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t * (hh // p) * (ww // p), p * p * c)


def _unpatchify(cfg: MagiModelConfig, geo: MagiGeometry, x: jax.Array,
                t: int) -> jax.Array:
    b = x.shape[0]
    p = cfg.patch_size
    x = x.reshape(b, t, geo.grid_h, geo.grid_w, p, p, cfg.out_channels)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t, geo.latent_h, geo.latent_w, cfg.out_channels)


def _magi_layer(
    blk: Params,
    h_x: jax.Array,            # [B, n_chunks*ct, hidden]
    cvec: jax.Array,           # [B, n_chunks, cond] fp32
    y: jax.Array,              # [B, n_chunks, cap_len, hidden] projected
    caption_mask: jax.Array,   # [B, n_chunks, cap_len]
    k_layer: jax.Array,        # [B, Smax, nkv, hd] this layer's cache
    v_layer: jax.Array,
    *,
    cfg: MagiModelConfig,
    spec: KVCacheSpec,
    n_chunks: int,
    ct: int,
    angles: jax.Array,
    token_ranges: jax.Array,
    current_start: jax.Array,
    current_end: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One MAGI transformer layer (shared by the lax.scan path and the
    pipeline-parallel path). Returns (h_x, new_k_layer, new_v_layer)."""
    b = h_x.shape[0]
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_query_groups,
                   cfg.kv_channels)
    eps = cfg.layernorm_epsilon
    ada = _linear(blk["ada"], jax.nn.silu(cvec))  # [B, n_chunks, 6h] f32
    ada = ada.reshape(b, n_chunks, 6, cfg.hidden_size)
    shift_msa, scale_msa, gate_msa = ada[:, :, 0], ada[:, :, 1], ada[:, :, 2]
    shift_mlp, scale_mlp, gate_mlp = ada[:, :, 3], ada[:, :, 4], ada[:, :, 5]

    def mod(xs_, sh, sc):
        xs_ = xs_.reshape(b, n_chunks, ct, -1)
        out = xs_ * (1.0 + sc[:, :, None]).astype(xs_.dtype) \
            + sh[:, :, None].astype(xs_.dtype)
        return out.reshape(b, n_chunks * ct, -1)

    def gate(xs_, g):
        xs_ = xs_.reshape(b, n_chunks, ct, -1)
        return (xs_ * g[:, :, None].astype(xs_.dtype)).reshape(
            b, n_chunks * ct, -1)

    # --- self attention (GQA, chunk-causal via per-chunk spans) ---
    sa = blk["self_attn"]
    h_in = mod(_ln1p(blk["norm1"], h_x, eps), shift_msa, scale_msa)
    q = rms_norm(_linear(sa["q"], h_in), sa["norm_q"]["w"], eps)
    k = rms_norm(_linear(sa["k"], h_in), sa["norm_k"]["w"], eps)
    v = _linear(sa["v"], h_in)
    q = q.reshape(b, n_chunks * ct, nh, hd)
    k = k.reshape(b, n_chunks * ct, nkv, hd)
    v = v.reshape(b, n_chunks * ct, nkv, hd)
    q = apply_rope(q, angles)
    k = apply_rope(k, angles)

    k_layer, v_layer = write_block(spec, k_layer, v_layer, k, v,
                                   current_start)

    # per-chunk attention over its kv span. GQA: on TPU the grouped
    # flash wrapper folds query-head groups into query rows (KV read
    # once per group); the CPU fallback repeats KV heads.
    use_pallas = jax.default_backend() == "tpu"
    outs = []
    rep = nh // nkv
    for ci in range(n_chunks):
        qi = q[:, ci * ct:(ci + 1) * ct]
        span = token_ranges[ci]
        if use_pallas:
            from ...ops.flash_attention import flash_attention_gqa

            outs.append(flash_attention_gqa(
                qi, k_layer, v_layer,
                kv_len=jnp.minimum(span[1], current_end),
                kv_start=span[0],
            ))
        else:
            kc = jnp.repeat(k_layer, rep, axis=2)
            vc = jnp.repeat(v_layer, rep, axis=2)
            idx = jnp.arange(spec.max_tokens, dtype=jnp.int32)
            mask = (idx >= span[0]) & (idx < jnp.minimum(span[1], current_end))
            outs.append(cache_attention(qi, kc, vc, kv_mask=mask))
    attn = jnp.concatenate(outs, axis=1).reshape(b, n_chunks * ct, nh * hd)
    h_x = h_x + gate(_linear(sa["o"], attn), gate_msa)

    # --- caption cross attention (per chunk captions) ---
    ca = blk["cross_attn"]
    hq = _ln1p(blk["norm1"], h_x, eps)
    cq = _linear(ca["q"], hq).reshape(b, n_chunks, ct, nh, hd)
    ck = _linear(ca["k"], y).reshape(b, n_chunks, -1, nkv, hd)
    cv = _linear(ca["v"], y).reshape(b, n_chunks, -1, nkv, hd)
    cq = cq.reshape(b * n_chunks, ct, nh, hd)
    ck = jnp.repeat(ck.reshape(b * n_chunks, -1, nkv, hd), rep, axis=2)
    cv = jnp.repeat(cv.reshape(b * n_chunks, -1, nkv, hd), rep, axis=2)
    cmask = caption_mask.reshape(b * n_chunks, -1) > 0
    xa = cache_attention(cq, ck, cv, kv_mask=cmask)
    xa = xa.reshape(b, n_chunks * ct, nh * hd)
    h_x = h_x + _linear(ca["o"], xa)

    # --- FFN ---
    h_f = mod(_ln1p(blk["norm2"], h_x, eps), shift_mlp, scale_mlp)
    ff = _linear(blk["ffn"]["fc2"],
                 jax.nn.gelu(_linear(blk["ffn"]["fc1"], h_f),
                             approximate=True))
    h_x = h_x + gate(ff, gate_mlp)
    return h_x, k_layer, v_layer


def magi_forward(
    params: Params,
    statics: MagiStatics,
    rope_tables: RopeTables,
    x_window: jax.Array,     # [B, n_chunks*chunk_width, H, W, C] latents
    t: jax.Array,            # [B, n_chunks] in [0, 1] (0=noise, 1=clean)
    captions: jax.Array,     # [B, n_chunks, cap_len, cap_dim]
    caption_mask: jax.Array,  # [B, n_chunks, cap_len]
    cache: KVCache,
    slice_point: jax.Array,  # scalar int32: chunk index of window chunk 0
    kv_ranges: jax.Array,    # [n_chunks, 2] int32 chunk-range [start, end)/chunk
) -> Tuple[jax.Array, KVCache]:
    """One window forward. All window chunks' KV is written into the cache at
    their logical positions; chunk i attends to token span
    [kv_ranges[i,0]*chunk_tokens, kv_ranges[i,1]*chunk_tokens). Returns
    (velocity [B, n_chunks*cw, H, W, out], updated cache)."""
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_window.shape[0]
    n_chunks = t.shape[1]
    cw, ct = geo.chunk_width, geo.chunk_tokens
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_query_groups, cfg.kv_channels
    eps = cfg.layernorm_epsilon

    tokens = _linear(params["patch_embed"], _patchify(cfg, geo, x_window))

    # condition: per-chunk timestep embedding (fp32)
    temb = sinusoidal_embedding_1d(256, t.astype(jnp.float32) * 1000.0)
    cvec = _linear(params["t_embedder"]["fc2"],
                   jax.nn.silu(_linear(params["t_embedder"]["fc1"], temb)))
    # cvec: [B, n_chunks, cond]

    # captions: [B, n_chunks, L, capdim] -> per-chunk projected K/V inputs
    y = _linear(params["y_embedder"]["fc2"],
                jax.nn.gelu(_linear(params["y_embedder"]["fc1"],
                                    captions.astype(tokens.dtype)),
                            approximate=True))

    # rope over frames: window chunk 0 starts at frame slice_point*cw
    start_frame = slice_point * cw
    angles = rope_angles(rope_tables, n_chunks * cw, geo.grid_h, geo.grid_w,
                         start_frame)

    current_start = slice_point * ct
    current_end = current_start + n_chunks * ct
    token_ranges = kv_ranges * ct  # [n_chunks, 2]

    def chunked_mod(xs, mod):
        """xs [B, S, h] with S = n_chunks*ct; mod [B, n_chunks, h]."""
        xs = xs.reshape(b, n_chunks, ct, -1)
        out = xs * (1.0 + mod[:, :, None, 1]).astype(xs.dtype) \
            + mod[:, :, None, 0].astype(xs.dtype)
        return out.reshape(b, n_chunks * ct, -1)

    def layer(carry, xs):
        h_x, k_all, v_all = carry
        blk, lid = xs
        k_layer = jax.lax.dynamic_index_in_dim(k_all, lid, 0, keepdims=False)
        v_layer = jax.lax.dynamic_index_in_dim(v_all, lid, 0, keepdims=False)
        h_x, k_layer, v_layer = _magi_layer(
            blk, h_x, cvec, y, caption_mask, k_layer, v_layer,
            cfg=cfg, spec=spec, n_chunks=n_chunks, ct=ct, angles=angles,
            token_ranges=token_ranges, current_start=current_start,
            current_end=current_end,
        )
        k_all = jax.lax.dynamic_update_index_in_dim(
            k_all, k_layer.astype(k_all.dtype), lid, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(
            v_all, v_layer.astype(v_all.dtype), lid, 0)
        return (h_x, k_all, v_all), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (h_x, new_k, new_v), _ = jax.lax.scan(
        layer, (tokens, cache.k, cache.v), (params["blocks"], layer_ids)
    )

    # final: per-chunk modulated norm + linear
    fada = _linear(params["final_ada"], jax.nn.silu(cvec)).reshape(
        b, n_chunks, 2, cfg.hidden_size)
    h_out = chunked_mod(_ln1p(params["final_norm"], h_x, eps),
                        fada[:, :, [0, 1]].transpose(0, 1, 2, 3))
    out = _linear(params["final_linear"], h_out)
    velocity = _unpatchify(cfg, geo, out, n_chunks * cw)
    return velocity, KVCache(k=new_k, v=new_v)


def magi_forward_pp(
    params: Params,
    statics: MagiStatics,
    rope_tables: RopeTables,
    x_window: jax.Array,
    t: jax.Array,
    captions: jax.Array,
    caption_mask: jax.Array,
    cache: KVCache,
    slice_point: jax.Array,
    kv_ranges: jax.Array,
    *,
    mesh,
) -> Tuple[jax.Array, KVCache]:
    """Pipeline-parallel MAGI window forward: same contract as
    `magi_forward`, but the layer stack runs through the microbatched
    GPipe pipeline (`parallel/pipeline_parallel.py:pp_pipeline`) with the
    stacked layer axis (params AND KV cache) sharded over the mesh's `pp`
    axis. Microbatches are the batch rows — for the 2-row CFG batch the
    cond/uncond halves occupy consecutive stages, the TPU analog of the
    reference's work queue keeping PP stages busy
    (`inferix/pipeline/magi/video_generate.py:723-756`).

    Embeddings and the output head are small and run outside the pipeline
    (replicated); all layer FLOPs are stage-local.
    """
    from ...parallel.pipeline_parallel import pp_pipeline

    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_window.shape[0]
    n_chunks = t.shape[1]
    cw, ct = geo.chunk_width, geo.chunk_tokens
    eps = cfg.layernorm_epsilon

    tokens = _linear(params["patch_embed"], _patchify(cfg, geo, x_window))
    temb = sinusoidal_embedding_1d(256, t.astype(jnp.float32) * 1000.0)
    cvec = _linear(params["t_embedder"]["fc2"],
                   jax.nn.silu(_linear(params["t_embedder"]["fc1"], temb)))
    y = _linear(params["y_embedder"]["fc2"],
                jax.nn.gelu(_linear(params["y_embedder"]["fc1"],
                                    captions.astype(tokens.dtype)),
                            approximate=True))
    start_frame = slice_point * cw
    angles = rope_angles(rope_tables, n_chunks * cw, geo.grid_h, geo.grid_w,
                         start_frame)
    current_start = slice_point * ct
    current_end = current_start + n_chunks * ct
    token_ranges = kv_ranges * ct

    # microbatches = batch rows: [M=b, 1, ...] each
    microbatches = {
        "h": tokens[:, None],
        "cvec": cvec[:, None],
        "y": y[:, None],
        "cmask": caption_mask[:, None],
    }
    layer_state = {"k": cache.k, "v": cache.v}

    def layer_fn(blk, state, x, mb_idx):
        # state: this layer's cache [B, Smax, nkv, hd]; the microbatch owns
        # batch row mb_idx
        k_row = jax.lax.dynamic_slice_in_dim(state["k"], mb_idx, 1, 0)
        v_row = jax.lax.dynamic_slice_in_dim(state["v"], mb_idx, 1, 0)
        h_new, k_new, v_new = _magi_layer(
            blk, x["h"], x["cvec"], x["y"], x["cmask"], k_row, v_row,
            cfg=cfg, spec=spec, n_chunks=n_chunks, ct=ct, angles=angles,
            token_ranges=token_ranges, current_start=current_start,
            current_end=current_end,
        )
        new_state = {
            "k": jax.lax.dynamic_update_slice_in_dim(
                state["k"], k_new.astype(state["k"].dtype), mb_idx, 0),
            "v": jax.lax.dynamic_update_slice_in_dim(
                state["v"], v_new.astype(state["v"].dtype), mb_idx, 0),
        }
        return {**x, "h": h_new}, new_state

    outs, new_state = pp_pipeline(
        mesh, layer_fn, params["blocks"], microbatches,
        layer_state=layer_state, pass_mb_index=True,
    )
    h_x = outs["h"][:, 0]  # [B, S, hidden]

    fada = _linear(params["final_ada"], jax.nn.silu(cvec)).reshape(
        b, n_chunks, 2, cfg.hidden_size)
    h_n = _ln1p(params["final_norm"], h_x, eps).reshape(b, n_chunks, ct, -1)
    h_out = (h_n * (1.0 + fada[:, :, None, 1]).astype(h_n.dtype)
             + fada[:, :, None, 0].astype(h_n.dtype)).reshape(
                 b, n_chunks * ct, -1)
    out = _linear(params["final_linear"], h_out)
    velocity = _unpatchify(cfg, geo, out, n_chunks * cw)
    return velocity, KVCache(k=new_state["k"], v=new_state["v"])
