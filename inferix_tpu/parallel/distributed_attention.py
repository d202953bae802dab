"""Distributed cached self-attention INSIDE the model forward.

This is the production sequence-parallel path the reference runs inside
`CausalWanSelfAttention` when CP > 1 (`inferix/models/attention/
distributed.py:134-712` CoreAttention: Ulysses SeqAllToAll4D head<->sequence
exchange, KV-cache-aware ring attention pass-q with prefix-causal gating at
`:199-208,442-449`), re-designed for a JAX mesh:

* `ulysses_cache_attention` — block tokens are sharded over `sp`; one
  all-to-all turns the token shard into a head shard (every device sees ALL
  query tokens for H/(sp*tp) heads), the device attends over the full cached
  prefix + own block for its head group with the normal prefix kernel, and a
  second all-to-all restores token sharding. The KV cache stays head-sharded
  over (tp, sp) — each device only ever touches its own heads' cache, which
  is the TPU analog of the reference allocating `num_kv_heads //
  ulysses_size` per rank (`self_forcing_kv_cache_manager.py:45-50`).
* `ring_pass_q_cache_attention` — the cache stays token-sharded over `sp`
  (the reference's `seq // ring_size` split); queries + their online-softmax
  accumulators (out, m, l) rotate around the ring with `ppermute`, attending
  to each device's cache slice. The prefix validity mask plays the role of
  the reference's prefix-causal gating: remote slices expose exactly the
  cached tokens (`distributed.py:442-449`).

Both run as `shard_map` islands inside the jitted forward — everything else
(linears, norms) remains GSPMD-sharded. The local per-shard attention uses
the same Pallas flash kernel as the single-device path on TPU and the
chunked XLA fallback on CPU meshes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention_chunked


def _island_shard_map(body, mesh, in_specs, out_specs,
                      axes=("dp", "tp", "sp")):
    """shard_map constructor for the attention islands.

    Top level (the usual case): bind the concrete mesh — full-manual over
    every mesh axis, the existing behavior. Inside a PARTIALLY-MANUAL
    context (the pp pipeline's body runs manual over 'pp' with tp/sp left
    to GSPMD — the composed 24B tp4 x pp2 serving layout), jax rejects a
    concrete mesh whose axis_types disagree with the context, so the
    island must inherit the context mesh and name its own axes explicitly
    (axis_names), going manual over (dp, tp, sp) while 'pp' stays manual
    from the enclosing scope."""
    manual_ctx = False
    try:
        ctx = jax.sharding.get_abstract_mesh()
        if ctx is not None and getattr(ctx, "shape_tuple", None):
            manual_ctx = any(
                "Manual" in str(t) for t in getattr(ctx, "axis_types", ()))
    except Exception:
        manual_ctx = False
    if manual_ctx:
        return jax.shard_map(body, in_specs=in_specs, out_specs=out_specs,
                             axis_names=set(axes), check_vma=False)
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def _local_attn_lse(q, k, v, kv_mask, k_scales=None, v_scales=None,
                    kv_layout="bshd"):
    """Per-shard attention returning (out, lse [B, H, Sq]). With
    k_scales/v_scales ([B, Skv, H] f32; [B, H, Skv] for kv_layout='bhsd')
    the cache shard is int8 and the span kernel dequantizes in-kernel."""
    if k.dtype == jnp.float8_e4m3fn and jax.default_backend() != "tpu":
        # fp8 KV cache on the CPU fallback path: cast-only dequant (the
        # Pallas kernel casts in-kernel)
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    skv = k.shape[2] if kv_layout == "bhsd" else k.shape[1]
    if jax.default_backend() == "tpu" and skv > 1024:
        if kv_mask is None:
            kv_len = jnp.int32(skv)
        elif kv_mask.ndim == 2:
            kv_len = jnp.sum(kv_mask.astype(jnp.int32), axis=1)
        else:
            kv_len = jnp.sum(kv_mask.astype(jnp.int32))
        if k_scales is not None:
            from ..ops.flash_attention import flash_attention_prefix_quant

            return flash_attention_prefix_quant(
                q, k, v, k_scales, v_scales, kv_len, return_lse=True,
                kv_layout=kv_layout)
        from ..ops.flash_attention import flash_attention_prefix

        return flash_attention_prefix(q, k, v, kv_len, return_lse=True,
                                      kv_layout=kv_layout)
    if k_scales is not None:
        k = (k.astype(jnp.float32) * k_scales[..., None]).astype(q.dtype)
        v = (v.astype(jnp.float32) * v_scales[..., None]).astype(q.dtype)
    if kv_layout == "bhsd":
        # XLA fallback takes token-major (CPU mesh tests)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    return attention_chunked(q, k, v, kv_mask)


# ---------------------------------------------------------------------------
# Head-sharded GQA island (no collectives)
# ---------------------------------------------------------------------------

def _local_gqa(q, k, v, kv_mask):
    """Per-shard GQA attention over FRESH (non-cache) K/V: q [B, S, Hq, D],
    k/v [B, Skv, Hkv, D], Hq % Hkv == 0; kv_mask must be a prefix mask."""
    if jax.default_backend() == "tpu":
        from ..ops.flash_attention import flash_attention_gqa

        if kv_mask is None:
            kv_len = jnp.int32(k.shape[1])
        elif kv_mask.ndim == 2:
            kv_len = jnp.sum(kv_mask.astype(jnp.int32), axis=1)
        else:
            kv_len = jnp.sum(kv_mask.astype(jnp.int32))
        return flash_attention_gqa(q, k, v, kv_len=kv_len)
    rep = q.shape[2] // k.shape[2]
    kf = jnp.repeat(k.astype(q.dtype), rep, axis=2)
    vf = jnp.repeat(v.astype(q.dtype), rep, axis=2)
    out, _ = attention_chunked(q, kf, vf, kv_mask)
    return out


def gqa_head_island(
    mesh: Mesh,
    q: jax.Array,        # [B, S, Hq, D] — heads GSPMD-sharded over (tp, sp)
    k: jax.Array,        # [B, Skv, Hkv, D] fresh K (same head sharding)
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,   # [Skv] or [B, Skv] PREFIX mask
) -> jax.Array:
    """Embarrassingly-parallel attention over head shards — no collectives.

    Exists because the Pallas GQA kernel cannot be GSPMD-auto-partitioned:
    when the projections are tp-sharded (magi_param_pspecs) a bare
    pallas_call on their head-sharded outputs would force XLA to gather /
    replicate. Every head group's attention is independent and the kv
    heads are co-sharded with the q heads, so the island is just a
    shard_map wrapper: each device attends its own Hq/(tp*sp) heads over
    its own Hkv/(tp*sp) kv heads and ALL tokens. Used by the MAGI 3-CFG
    prefix-free uncond forward and the caption cross-attention (reference
    UnconditionGuard dit_model.py:446-492 / cross_attn dit_module.py:1047-
    1085, which run under the same CP groups in the reference)."""
    ts = mesh.shape.get("tp", 1) * mesh.shape.get("sp", 1)
    assert q.shape[2] % ts == 0 and k.shape[2] % ts == 0, (
        f"tp*sp {ts} must divide q heads {q.shape[2]} and kv heads "
        f"{k.shape[2]}")
    extra_args, extra_specs = [], []
    if kv_mask is not None:
        extra_args.append(kv_mask)
        extra_specs.append(P("dp", None) if kv_mask.ndim == 2 else P(None))

    def body(q_, k_, v_, *rest):
        return _local_gqa(q_, k_, v_, rest[0] if rest else None)

    return _island_shard_map(
        body, mesh,
        in_specs=(P("dp", None, ("tp", "sp"), None),) * 3
        + tuple(extra_specs),
        out_specs=P("dp", None, ("tp", "sp"), None),
    )(q, k, v, *extra_args)


# ---------------------------------------------------------------------------
# Ulysses: head <-> sequence all-to-all around a full-prefix local attention
# ---------------------------------------------------------------------------

def _ulysses_body(q, k, v, kv_mask, k_scales=None, v_scales=None,
                  kv_layout="bshd"):
    # q: [B, S/sp, H_loc, D] (token shard); k/v: [B, Smax, H_loc/sp, D]
    # (head shard of the cache; head-major caches arrive [B, H_loc/sp,
    # Smax, D]). a2a over sp: scatter heads, gather tokens. Scales (int8
    # cache) are head-sharded with the cache — no exchange.
    qg = jax.lax.all_to_all(q, "sp", split_axis=2, concat_axis=1, tiled=True)
    out, _ = _local_attn_lse(qg, k, v, kv_mask, k_scales, v_scales,
                             kv_layout=kv_layout)
    return jax.lax.all_to_all(out, "sp", split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_cache_attention(
    mesh: Mesh,
    q: jax.Array,        # [B, Sq, H, D] — block queries (tokens over sp)
    k: jax.Array,        # [B, Smax, H, D] — post-write cache (heads over sp)
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,   # [Smax] or [B, Smax]
    k_scales: Optional[jax.Array] = None,  # [B, Smax, H] f32 (int8 cache;
                                           # [B, H, Smax] when kv_layout)
    v_scales: Optional[jax.Array] = None,
    kv_layout: str = "bshd",               # 'bhsd': head-major cache
) -> jax.Array:
    sp = mesh.shape["sp"]
    tp = mesh.shape.get("tp", 1)
    assert q.shape[2] % (sp * tp) == 0, (
        f"heads {q.shape[2]} must divide sp*tp {sp * tp}")
    assert q.shape[1] % sp == 0, (
        f"block tokens {q.shape[1]} must divide sp {sp}")
    if kv_layout == "bhsd":
        # head axis leads: the shard axis moves with it
        cache_spec = P("dp", ("tp", "sp"), None, None)
        scale_spec = P("dp", ("tp", "sp"), None)
    else:
        cache_spec = P("dp", None, ("tp", "sp"), None)
        scale_spec = P("dp", None, ("tp", "sp"))
    extra_args, extra_specs = [], []
    if kv_mask is not None:
        extra_args.append(kv_mask)
        extra_specs.append(P("dp", None) if kv_mask.ndim == 2 else P(None))
    has_mask = kv_mask is not None
    if k_scales is not None:
        extra_args += [k_scales, v_scales]
        extra_specs += [scale_spec] * 2

    def body(q_, k_, v_, *rest):
        mask = rest[0] if has_mask else None
        scales = rest[1 if has_mask else 0:]
        ks_, vs_ = scales if scales else (None, None)
        return _ulysses_body(q_, k_, v_, mask, ks_, vs_, kv_layout=kv_layout)

    return _island_shard_map(
        body, mesh,
        in_specs=(
            P("dp", "sp", "tp", None),          # q: tokens over sp
            cache_spec,                         # cache: heads over tp x sp
            cache_spec,
        ) + tuple(extra_specs),
        out_specs=P("dp", "sp", "tp", None),
    )(q, k, v, *extra_args)


# ---------------------------------------------------------------------------
# Ring pass-q over the token-sharded cache
# ---------------------------------------------------------------------------

def _ring_pass_q_cache_body(q, k, v, kv_mask, k_scales=None, v_scales=None,
                            kv_layout="bshd"):
    """q: [B, Sq/sp, H_loc, D]; k/v: [B, Smax/sp, H_loc, D] cache slice;
    kv_mask: local slice of the prefix-validity mask. The (q, out, m, l)
    bundle rotates; K/V stay resident (bytes on the wire are O(q), the
    reference's pass-q rationale for cache-dominated attention). With
    k_scales/v_scales the cache slice is int8; scales are token-sharded
    with the cache and stay resident too."""
    sp = jax.lax.psum(1, "sp")
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    b, s_loc, h, d = q.shape

    def step(carry, _):
        q_cur, acc, m_run, l_run = carry
        out_i, lse_i = _local_attn_lse(q_cur, k, v, kv_mask,
                                       k_scales, v_scales,
                                       kv_layout=kv_layout)
        m_new = jnp.maximum(m_run, lse_i)
        # fully-masked local slices yield lse = -inf; guard the exp terms
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        w_old = jnp.where(jnp.isfinite(m_run),
                          jnp.exp(m_run - m_safe), 0.0)
        w_new = jnp.where(jnp.isfinite(lse_i),
                          jnp.exp(lse_i - m_safe), 0.0)
        acc = acc * w_old.transpose(0, 2, 1)[..., None] \
            + out_i.astype(jnp.float32) * w_new.transpose(0, 2, 1)[..., None]
        l_new = l_run * w_old + w_new
        q_nxt = jax.lax.ppermute(q_cur, "sp", perm)
        acc = jax.lax.ppermute(acc, "sp", perm)
        m_hop = jax.lax.ppermute(m_new, "sp", perm)
        l_hop = jax.lax.ppermute(l_new, "sp", perm)
        return (q_nxt, acc, m_hop, l_hop), None

    acc0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    (_, acc, _, l_f), _ = jax.lax.scan(step, (q, acc0, m0, l0), None,
                                       length=sp)
    out = acc / jnp.maximum(l_f, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_pass_q_cache_attention(
    mesh: Mesh,
    q: jax.Array,        # [B, Sq, H, D] tokens over sp
    k: jax.Array,        # [B, Smax, H, D] cache, TOKENS over sp
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,  # [B, Smax, H] f32 (int8 cache;
                                           # [B, H, Smax] when kv_layout)
    v_scales: Optional[jax.Array] = None,
    kv_layout: str = "bshd",               # 'bhsd': head-major cache
) -> jax.Array:
    sp = mesh.shape["sp"]
    kv_seq_axis = 2 if kv_layout == "bhsd" else 1
    assert q.shape[1] % sp == 0 and k.shape[kv_seq_axis] % sp == 0
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[kv_seq_axis]), dtype=bool)
    if kv_mask.ndim == 1:
        mask_spec = P("sp")
    else:
        mask_spec = P("dp", "sp")
    if kv_layout == "bhsd":
        # tokens stay the ring-sharded axis; heads lead
        cache_spec = P("dp", "tp", "sp", None)
        scale_spec = P("dp", "tp", "sp")
    else:
        cache_spec = P("dp", "sp", "tp", None)
        scale_spec = P("dp", "sp", "tp")

    extra_args, extra_specs = [], []
    if k_scales is not None:
        # scales ride with the token-sharded cache slice
        extra_args += [k_scales, v_scales]
        extra_specs += [scale_spec] * 2

    def body(q_, k_, v_, mask_, *scales):
        ks_, vs_ = scales if scales else (None, None)
        return _ring_pass_q_cache_body(q_, k_, v_, mask_, ks_, vs_,
                                       kv_layout=kv_layout)

    return _island_shard_map(
        body, mesh,
        in_specs=(
            P("dp", "sp", "tp", None),
            cache_spec,
            cache_spec,
            mask_spec,
        ) + tuple(extra_specs),
        out_specs=P("dp", "sp", "tp", None),
    )(q, k, v, kv_mask, *extra_args)


# ---------------------------------------------------------------------------
# Ring pass-kv: the cache slices rotate, queries stay resident
# ---------------------------------------------------------------------------

def _ring_pass_kv_cache_body(q, k, v, kv_mask, k_scales=None, v_scales=None,
                             kv_layout="bshd"):
    """Classic ring attention (reference ring_attention_forward_pass_kv,
    `inferix/models/attention/distributed.py:564-712`): the K/V cache
    slices — with their validity-mask slice and, for the int8 cache, their
    scale slices — rotate around the ring with `ppermute`; the queries and
    their online-softmax accumulators (acc, m, l) stay RESIDENT and merge
    each arriving slice with the standard flash LSE correction.

    Wire volume per layer is sp hops x O(cache/sp) = O(cache) vs pass-q's
    O(block): for cached semi-AR (cache 32760 tokens vs 4680-token blocks)
    pass-kv moves ~7x more bytes, which is why pass-q is the default ring
    mode (BASELINE SCALING_r04 wire table). pass-kv wins only when the
    live block dominates the cache (Sq >> Smax/sp: prefill-style calls,
    very short windows) — the same regime split the reference's
    `_select_strategy` heuristic encodes (`distributed.py:96-131`)."""
    sp = jax.lax.psum(1, "sp")
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    b, s_loc, h, d = q.shape
    quant = k_scales is not None

    def step(carry, _):
        if quant:
            (k_cur, v_cur, mask_cur, ks_cur, vs_cur,
             acc, m_run, l_run) = carry
        else:
            k_cur, v_cur, mask_cur, acc, m_run, l_run = carry
            ks_cur = vs_cur = None
        out_i, lse_i = _local_attn_lse(q, k_cur, v_cur, mask_cur,
                                       ks_cur, vs_cur, kv_layout=kv_layout)
        m_new = jnp.maximum(m_run, lse_i)
        # fully-masked remote slices yield lse = -inf; guard the exp terms
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        w_old = jnp.where(jnp.isfinite(m_run),
                          jnp.exp(m_run - m_safe), 0.0)
        w_new = jnp.where(jnp.isfinite(lse_i),
                          jnp.exp(lse_i - m_safe), 0.0)
        acc = acc * w_old.transpose(0, 2, 1)[..., None] \
            + out_i.astype(jnp.float32) * w_new.transpose(0, 2, 1)[..., None]
        l_new = l_run * w_old + w_new
        hop = lambda x: jax.lax.ppermute(x, "sp", perm)
        if quant:
            return (hop(k_cur), hop(v_cur), hop(mask_cur), hop(ks_cur),
                    hop(vs_cur), acc, m_new, l_new), None
        return (hop(k_cur), hop(v_cur), hop(mask_cur),
                acc, m_new, l_new), None

    acc0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    carry0 = (k, v, kv_mask) + ((k_scales, v_scales) if quant else ()) \
        + (acc0, m0, l0)
    carry, _ = jax.lax.scan(step, carry0, None, length=sp)
    acc, l_f = carry[-3], carry[-1]
    out = acc / jnp.maximum(l_f, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_pass_kv_cache_attention(
    mesh: Mesh,
    q: jax.Array,        # [B, Sq, H, D] tokens over sp
    k: jax.Array,        # [B, Smax, H, D] cache, TOKENS over sp
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,  # [B, Smax, H] f32 (int8 cache;
                                           # [B, H, Smax] when kv_layout)
    v_scales: Optional[jax.Array] = None,
    kv_layout: str = "bshd",               # 'bhsd': head-major cache
) -> jax.Array:
    """Same sharding contract as `ring_pass_q_cache_attention` (cache tokens
    over sp, q tokens over sp, heads over tp); only the rotation direction
    of the ring differs — see `_ring_pass_kv_cache_body`."""
    sp = mesh.shape["sp"]
    kv_seq_axis = 2 if kv_layout == "bhsd" else 1
    assert q.shape[1] % sp == 0 and k.shape[kv_seq_axis] % sp == 0
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[kv_seq_axis]), dtype=bool)
    if kv_mask.ndim == 1:
        mask_spec = P("sp")
    else:
        mask_spec = P("dp", "sp")
    if kv_layout == "bhsd":
        cache_spec = P("dp", "tp", "sp", None)
        scale_spec = P("dp", "tp", "sp")
    else:
        cache_spec = P("dp", "sp", "tp", None)
        scale_spec = P("dp", "sp", "tp")

    extra_args, extra_specs = [], []
    if k_scales is not None:
        extra_args += [k_scales, v_scales]
        extra_specs += [scale_spec] * 2

    def body(q_, k_, v_, mask_, *scales):
        ks_, vs_ = scales if scales else (None, None)
        return _ring_pass_kv_cache_body(q_, k_, v_, mask_, ks_, vs_,
                                        kv_layout=kv_layout)

    return _island_shard_map(
        body, mesh,
        in_specs=(
            P("dp", "sp", "tp", None),
            cache_spec,
            cache_spec,
            mask_spec,
        ) + tuple(extra_specs),
        out_specs=P("dp", "sp", "tp", None),
    )(q, k, v, kv_mask, *extra_args)


# ---------------------------------------------------------------------------
# CSO: per-chunk shuffled Ulysses pipeline (MAGI multi-range denoising)
# ---------------------------------------------------------------------------

def _cso_local_span_attn(qg, k, v, span_start, span_end,
                         k_scales=None, v_scales=None, kv_layout="bshd"):
    """Local per-chunk attention over the kv span [span_start, span_end) of
    the head-sharded cache. qg: [B, ct, Hq_loc, D]; k/v: [B, Smax, Hkv_loc, D].
    With k_scales/v_scales ([B, Smax, Hkv_loc] f32) the cache is int8 and the
    span kernel dequantizes in-kernel (the 24B serving plan needs sp-sharded
    windows AND the halved-HBM cache simultaneously)."""
    if jax.default_backend() == "tpu":
        if k_scales is not None:
            from ..ops.flash_attention import flash_attention_gqa_quant

            return flash_attention_gqa_quant(
                qg, k, v, k_scales, v_scales, kv_len=span_end,
                kv_start=span_start, kv_layout=kv_layout)
        from ..ops.flash_attention import flash_attention_gqa

        return flash_attention_gqa(qg, k, v, kv_len=span_end,
                                   kv_start=span_start, kv_layout=kv_layout)
    if k_scales is not None:
        k = (k.astype(jnp.float32) * k_scales[..., None]).astype(qg.dtype)
        v = (v.astype(jnp.float32) * v_scales[..., None]).astype(qg.dtype)
    if kv_layout == "bhsd":
        # XLA fallback takes token-major (CPU mesh tests)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    rep = qg.shape[2] // k.shape[2]
    kf = jnp.repeat(k.astype(qg.dtype), rep, axis=2)
    vf = jnp.repeat(v.astype(qg.dtype), rep, axis=2)
    idx = jnp.arange(k.shape[1], dtype=jnp.int32)
    mask = (idx >= span_start) & (idx < span_end)
    out, _ = attention_chunked(qg, kf, vf, kv_mask=mask)
    return out


def cso_chunk_attention(
    mesh: Mesh,
    q: jax.Array,             # [B, n_chunks, ct, Hq, D] — ct sharded over sp
    k: jax.Array,             # [B, Smax, Hkv, D] cache — heads over sp
    v: jax.Array,
    token_ranges: jax.Array,  # [n_chunks, 2] int32 token span per chunk
    current_end: jax.Array,   # scalar int32 clamp (live window end)
    k_scales: Optional[jax.Array] = None,  # [B, Smax, Hkv] f32 (int8 cache;
                                           # [B, Hkv, Smax] when kv_layout)
    v_scales: Optional[jax.Array] = None,
    whole_window: bool = False,
    kv_layout: str = "bshd",               # 'bhsd': head-major window cache
) -> jax.Array:
    """Context-shuffle-overlap attention: the TPU redesign of the reference's
    CSO CP strategy (`inferix/distributed/parallelism/context_parallel.py:258-306`
    cp_shuffle_overlap_process + `:604-665` CSOHelper.overlap,
    dispatched from `magi/dit/dit_module.py:1087-1195`).

    The reference shuffles the window so every rank holds 1/cp of EVERY
    denoising range (uniform load even though ranges attend to different kv
    spans), then software-pipelines per-range attention against the a2a of
    the next range's queries. Here the shuffle is the sharding itself —
    splitting each chunk's `ct` tokens over `sp` IS the slice-of-every-range
    layout — and the per-chunk loop issues independent a2a -> attend -> a2a
    chains that XLA's async collective scheduler overlaps (chunk i's kernel
    runs while chunk i+1's all-to-all is in flight), which is the TPU-native
    form of CSOHelper's manual double buffering.

    Per chunk: all-to-all scatters Hq over sp / gathers the chunk's tokens
    (every device gets the FULL chunk for Hq/sp heads), local GQA span
    attention over the device's Hkv/sp cache heads, and the reverse
    all-to-all restores the shuffle layout.

    COMPOSES with tensor parallelism (the 24B serving plan's tp=4 x sp=2):
    q enters head-sharded over tp (GSPMD output of the head-sharded QKV
    matmuls) and token-sharded over sp; the island's sp all-to-all further
    splits the LOCAL (already tp-sharded) heads, so the effective head
    sharding inside is the combined (tp, sp) axis — the cache's kv heads
    are laid out the same way (P(..., ("tp", "sp"), ...)). The body is
    identical; tp only changes the specs.
    """
    sp = mesh.shape["sp"]
    tp = mesh.shape.get("tp", 1)
    n_chunks = q.shape[1]
    hkv_axis = 1 if kv_layout == "bhsd" else 2
    assert q.shape[3] % (sp * tp) == 0 and k.shape[hkv_axis] % (sp * tp) == 0, (
        f"tp*sp {tp}x{sp} must divide q heads {q.shape[3]} and kv heads "
        f"{k.shape[hkv_axis]}")
    assert q.shape[2] % sp == 0, (
        f"sp {sp} must divide chunk tokens {q.shape[2]}")

    quantized = k_scales is not None

    def body(q_, k_, v_, ranges_, cur_end_, ks_, vs_):
        if whole_window:
            # plain Ulysses (reference cp_ulysses, the engine default):
            # ONE a2a moves the whole window — fewer, larger collectives
            # than CSO's per-chunk chains; attention is per-chunk either
            # way (chunks attend different kv spans)
            qg = jax.lax.all_to_all(q_, "sp", split_axis=3, concat_axis=2,
                                    tiled=True)  # [B, nc, ct, Hq/sp, D]
            outs = [
                _cso_local_span_attn(
                    qg[:, ci], k_, v_, ranges_[ci][0],
                    jnp.minimum(ranges_[ci][1], cur_end_[0]),
                    k_scales=ks_, v_scales=vs_, kv_layout=kv_layout)
                for ci in range(n_chunks)
            ]
            out = jnp.stack(outs, axis=1)        # [B, nc, ct, Hq/sp, D]
            return jax.lax.all_to_all(out, "sp", split_axis=2,
                                      concat_axis=3, tiled=True)
        outs = []
        for ci in range(n_chunks):
            qi = q_[:, ci]                       # [B, ct/sp, Hq, D]
            qg = jax.lax.all_to_all(qi, "sp", split_axis=2, concat_axis=1,
                                    tiled=True)  # [B, ct, Hq/sp, D]
            span = ranges_[ci]
            out = _cso_local_span_attn(
                qg, k_, v_, span[0], jnp.minimum(span[1], cur_end_[0]),
                k_scales=ks_, v_scales=vs_, kv_layout=kv_layout)
            outs.append(jax.lax.all_to_all(out, "sp", split_axis=1,
                                           concat_axis=2, tiled=True))
        return jnp.stack(outs, axis=1)           # [B, n_chunks, ct/sp, Hq, D]

    if kv_layout == "bhsd":
        cache_spec = P("dp", ("tp", "sp"), None, None)
        scale_spec = P("dp", ("tp", "sp"), None)
        placeholder = (q.shape[0], k.shape[hkv_axis], 0)
    else:
        cache_spec = P("dp", None, ("tp", "sp"), None)
        scale_spec = P("dp", None, ("tp", "sp"))
        placeholder = (q.shape[0], 0, k.shape[hkv_axis])
    if not quantized:
        # shard_map can't take None leaves: bind zero-size placeholders
        k_scales = jnp.zeros(placeholder, jnp.float32)
        v_scales = k_scales
        body_fn = (lambda q_, k_, v_, r_, c_, ks_, vs_:
                   body(q_, k_, v_, r_, c_, None, None))
    else:
        body_fn = body

    return _island_shard_map(
        body_fn, mesh,
        in_specs=(
            # q: chunk tokens over sp, heads over tp (GSPMD matmul output)
            P("dp", None, "sp", "tp", None),
            cache_spec,                          # cache: kv heads (tp, sp)
            cache_spec,
            P(None, None),                       # token ranges (replicated)
            P(None),                             # current_end (replicated)
            scale_spec,                          # scales: kv heads (tp, sp)
            scale_spec,
        ),
        out_specs=P("dp", None, "sp", "tp", None),
    )(q, k, v, token_ranges, jnp.reshape(current_end, (1,)),
      k_scales, v_scales)


# ---------------------------------------------------------------------------
# Dispatch + comm accounting
# ---------------------------------------------------------------------------

def sp_cache_attention(
    mesh: Mesh,
    mode: str,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    kv_layout: str = "bshd",
) -> jax.Array:
    if mode == "ulysses":
        return ulysses_cache_attention(mesh, q, k, v, kv_mask,
                                       k_scales, v_scales,
                                       kv_layout=kv_layout)
    if mode in ("ring", "ring_pass_q"):
        return ring_pass_q_cache_attention(mesh, q, k, v, kv_mask,
                                           k_scales, v_scales,
                                           kv_layout=kv_layout)
    if mode == "ring_pass_kv":
        return ring_pass_kv_cache_attention(mesh, q, k, v, kv_mask,
                                            k_scales, v_scales,
                                            kv_layout=kv_layout)
    raise ValueError(f"unknown sp attention mode {mode!r}")


def sp_comm_bytes_per_layer(
    mode: str, sp: int, tp: int,
    batch: int, block_tokens: int, cache_tokens: int,
    num_heads: int, head_dim: int, itemsize: int = 2,
) -> int:
    """Per-layer, per-forward bytes each device puts on the ICI for the SP
    attention exchange (logged so multi-chip runs can sanity-check link
    budgets; the reference has no such accounting)."""
    if sp <= 1 or mode == "none":
        return 0
    h_loc = num_heads // tp
    if mode in ("ulysses", "cso"):
        # q in + out a2a: each device exchanges (sp-1)/sp of its local shard
        # (cso issues the same volume as ulysses, split per chunk so the
        # chunk-i kernel overlaps the chunk-i+1 exchange)
        local = batch * (block_tokens // sp) * h_loc * head_dim * itemsize
        return 2 * local * (sp - 1) // sp * sp  # both directions, all hops
    if mode == "ring_pass_kv":
        # K/V cache slices (+ mask) hop sp times: O(cache) total vs
        # pass-q's O(block) — the wire-table reason pass-q is the default
        kv_bytes = 2 * batch * (cache_tokens // sp) * h_loc * head_dim \
            * itemsize
        mask_bytes = batch * (cache_tokens // sp)
        return sp * (kv_bytes + mask_bytes)
    # ring pass-q: q + acc(f32) + m/l(f32) hop sp times
    q_bytes = batch * (block_tokens // sp) * h_loc * head_dim * itemsize
    acc_bytes = batch * (block_tokens // sp) * h_loc * head_dim * 4
    ml_bytes = 2 * batch * h_loc * (block_tokens // sp) * 4
    return sp * (q_bytes + acc_bytes + ml_bytes)
