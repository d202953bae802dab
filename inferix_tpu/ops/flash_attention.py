"""Pallas TPU flash attention over a (partially filled) KV cache.

Replaces the reference's external FlashAttention-2/3 / FlashInfer kernels
(`inferix/models/attention/backends.py:36-151`, `flash_attention.py:42-200`)
with a TPU-native fused kernel:

* online-softmax accumulation over KV blocks (classic flash), fp32 state
* prefix-validity aware: the KV cache's live region is always a prefix
  (`inferix_tpu/kvcache/cache.py valid_mask`), so the kernel takes `kv_len`
  as a SCALAR-PREFETCH argument. KV blocks beyond the prefix are skipped:
  the BlockSpec index map clamps their index (so Pallas re-uses the previous
  DMA instead of fetching dead cache lines) and `@pl.when` skips the FLOPs.
  Early semi-AR blocks therefore pay only for the cache they have.
* LSE output for ring-attention partial merging (same contract as the XLA
  fallback in `inferix_tpu/ops/attention.py`).

Grid: (B*H, q_blocks, kv_blocks), kv innermost; scratch accumulators persist
across the kv dimension.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Default KV block size for the prefix kernels. The isolated-kernel sweep
# (exp/r3_blocks.py, v5e, full 32760-token cache) says 8192 is fastest
# (5.65 ms vs 5.93 at 2048) — but e2e (exp/r3_kvblock_e2e.py) 8192 LOSES
# (clip 2.365 vs 2.517 f/s; sustained 2.047 vs 2.05): early blocks pay the
# padding and the microbench win vanishes under XLA's overlap of the cache
# slice/transpose copies with kernel time. 4096 is within noise both ways.
# Keep 2048. Read once at import; override per-process with INFERIX_KV_BLOCK.
DEFAULT_KV_BLOCK = int(os.environ.get("INFERIX_KV_BLOCK", "2048"))
# Query block: _fit_block() splits Sq into near-equal aligned blocks no
# larger than this (Sq=4680 -> 5 x 944 at the 1024 default). The isolated
# sweep (exp/r3_blocks.py) has (q=2368, kv=2048) at 5.73 ms vs (944, 2048)
# 5.93 at full cache, but e2e (exp/r3_kvblock_e2e.py with INFERIX_Q_BLOCK
# =2368) hits RESOURCE_EXHAUSTED on the 16 GB v5e — the [q_blk, kv_blk]
# fp32 probability tile's VMEM footprint quadruples. Keep 1024.
DEFAULT_Q_BLOCK = int(os.environ.get("INFERIX_Q_BLOCK", "1024"))


LOG2E = 1.4426950408889634


def _flash_kernel(
    # scalar prefetch: bounds [B, 2] = per-batch [kv_start, kv_end)
    bounds_ref,
    # inputs
    q_ref, k_ref, v_ref,
    # outputs
    o_ref, lse_ref,
    # scratch: (acc, m, l) for runmax, (acc, l) for fixedm
    acc_ref, *scratch,
    kv_block: int,
    num_kv_blocks: int,
    num_heads: int,
    fixedm: bool,
    span_grid: bool = False,
):
    """Softmax runs in the exp2 domain: the wrapper pre-multiplies q by
    scale*log2(e), so the kernel computes p = exp2(s - m) — saving the
    per-element scale multiply and the ln2 fold inside exp. The kernel is
    VPU-bound (the MXU matmuls cover <50% of its runtime), so per-element
    op count is the figure of merit; interior (fully valid) KV blocks skip
    the column masking entirely.

    span_grid=True: the grid's kv dimension covers only max_span tokens
    (not the whole padded cache) and grid step ki addresses cache block
    kv_start//kv_block + ki — see flash_attention_prefix(max_span=...).

    fixedm=True drops the running-max machinery entirely (p = exp2(s), no
    max reduce / m-subtract / correction multiplies — ~2 of the ~5 VPU
    passes per element; measured 6.82 -> 5.89 ms at the full 32760-token
    cache). Mathematically exact as long as exp2(s) stays inside fp32/bf16
    range, i.e. |natural logit| <~ 60 — guaranteed here because q and k are
    RMS/LN-normalized in every model that reaches this kernel (|s| <=
    sqrt(D)*log2(e)*g_q*g_k ~ 16*g^2 for unit-RMS inputs). Callers with
    unbounded logits must pass softmax='runmax'."""
    if fixedm:
        (l_ref,) = scratch
        m_ref = None
    else:
        m_ref, l_ref = scratch
    ki = pl.program_id(2)
    batch = pl.program_id(0) // num_heads
    kv_start = bounds_ref[batch, 0]
    kv_len = bounds_ref[batch, 1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if not fixedm:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    if span_grid:
        block_start = (kv_start // kv_block + ki) * kv_block
    else:
        block_start = ki * kv_block

    def _update(s):
        if fixedm:
            p = jnp.exp2(s)                              # [q_blk, kv_blk]
            l_ref[...] += jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
            )
        else:
            m_prev = m_ref[...]      # [q_blk, 128] lane-replicated
            l_prev = l_ref[...]
            m_cur = jnp.max(s, axis=-1, keepdims=True)   # [q_blk, 1]
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            corr = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new[:, :1])               # [q_blk, kv_blk]
            l_new = l_prev * corr + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
            )
        v = v_ref[0]
        if v.dtype == jnp.float8_e4m3fn:
            # fp8 KV cache: scale-free e4m3 storage, cast-only dequant
            v = v.astype(q_ref.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if fixedm:
            acc_ref[...] += pv
        else:
            acc_ref[...] = acc_ref[...] * corr[:, :1] + pv
            m_ref[...] = m_new
            l_ref[...] = l_new

    def _logits():
        k = k_ref[0]
        if k.dtype == jnp.float8_e4m3fn:
            k = k.astype(q_ref.dtype)
        return jax.lax.dot_general(
            q_ref[0], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q_blk, kv_blk]; q pre-scaled by scale*log2(e)

    interior = (block_start >= kv_start) & (block_start + kv_block <= kv_len)

    @pl.when(interior)
    def _compute_interior():
        _update(_logits())

    @pl.when(jnp.logical_not(interior)
             & (block_start < kv_len) & (block_start + kv_block > kv_start))
    def _compute_boundary():
        s = _logits()
        col = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        _update(jnp.where((col >= kv_start) & (col < kv_len), s, NEG_INF))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[...][:, :1]                            # [q_blk, 1]
        denom = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        # convert back from the exp2 domain: lse = ln(sum exp) = (m + log2 l)/log2e
        if fixedm:
            lse = jnp.log2(denom) / LOG2E
        else:
            lse = (m_ref[...][:, :1] + jnp.log2(denom)) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fit_block(size: int, max_block: int, align: int = 16) -> int:
    """Largest block <= max_block (aligned) that minimizes padding: with
    n = ceil(size/max_block) blocks, per-block = ceil(size/n) rounded up to
    the alignment. E.g. Sq=4680: naive 1024-blocks pad 9.4%; this picks 944
    (5 blocks, 0.9% padding)."""
    if size <= align:
        return align
    n = -(-size // max_block)
    per = -(-size // n)
    return -(-per // align) * align


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_block", "kv_block", "return_lse", "interpret",
                     "softmax", "max_span", "kv_layout"),
)
def flash_attention_prefix(
    q: jax.Array,          # [B, Sq, H, D]
    k: jax.Array,          # [B, Skv, H, D] (or [B, H, Skv, D], see kv_layout)
    v: jax.Array,          # [B, Skv, H, D]
    kv_len: jax.Array,     # scalar int32: end of the valid span
    kv_start: jax.Array | int = 0,  # start of the valid span
    scale: Optional[float] = None,
    q_block: Optional[int] = None,
    kv_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: bool = False,
    softmax: str = "fixedm",
    max_span: Optional[int] = None,
    kv_layout: str = "bshd",
):
    """Flash attention where valid KV is the span [kv_start, kv_len).

    softmax='fixedm' (default) uses the max-free online softmax — exact while
    |natural logit| <~ 60, which every normalized-QK attention satisfies;
    pass 'runmax' for the classic running-max variant (unbounded logits).

    max_span (static): a host-known upper bound on (kv_len - kv_start).
    When set, the grid's kv dimension shrinks to ceil(max_span/kv_block)+1
    steps that are REMAPPED onto the span's cache blocks, instead of one
    step per block of the whole padded cache — eliminating the dead
    grid-sequencer steps a short span pays on a long cache (MAGI early
    chunks attend 1-2 of ~9 cached chunks; Wan early blocks attend a short
    prefix of the full-clip cache). CALLER CONTRACT: every batch row's
    kv_len - kv_start must be <= max_span, otherwise the tail of the span
    is silently dropped.

    kv_layout: 'bshd' (default) takes k/v as [B, Skv, H, D] — the kernel's
    [B*H, Skv, D] fold is then a PHYSICAL TRANSPOSE of the whole cache
    slice, one XLA copy per layer per forward (the cache is a pallas_call
    operand, so the transpose cannot fuse away). 'bhsd' takes k/v already
    head-major [B, H, Skv, D]: the fold is a free reshape over contiguous
    dims, trading the per-forward cache copy for a small transpose of each
    written block at write time (exp/r7_cache_layout.py measures the
    difference at serving shapes)."""
    if softmax not in ("fixedm", "runmax"):
        raise ValueError(f"softmax must be 'fixedm' or 'runmax', got {softmax}")
    if kv_layout not in ("bshd", "bhsd"):
        raise ValueError(f"kv_layout must be 'bshd' or 'bhsd', got {kv_layout}")
    fixedm = softmax == "fixedm"
    b, sq, h, d = q.shape
    skv = k.shape[2] if kv_layout == "bhsd" else k.shape[1]
    if scale is None:
        scale = d**-0.5
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    q_block = _fit_block(sq, q_block)
    if kv_block is None:
        kv_block = DEFAULT_KV_BLOCK
    kv_block = min(kv_block, max(128, -(-skv // 128) * 128))

    # [B, S, H, D] -> [B*H, S, D]
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    if kv_layout == "bhsd":
        # head-major cache: the fold is a contiguous reshape, no copy
        kb = k.reshape(b * h, skv, d)
        vb = v.reshape(b * h, skv, d)
    else:
        kb, vb = bh(k), bh(v)
    qb = bh(q)
    # fold softmax scale + log2(e) into q (kernel softmax runs in exp2 domain)
    qb = (qb.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qb = _pad_to(qb, 1, q_block)
    kb = _pad_to(kb, 1, kv_block)
    vb = _pad_to(vb, 1, kv_block)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    n_q = sq_p // q_block
    n_kv = skv_p // kv_block
    if max_span is not None:
        # +1 step covers kv_start landing mid-block
        span_steps = -(-max_span // kv_block) + 1
        if span_steps < n_kv:
            n_kv = span_steps
        else:
            max_span = None
    span_grid = max_span is not None

    start_v = jnp.broadcast_to(jnp.asarray(kv_start, jnp.int32).reshape(-1), (b,))
    len_v = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,))
    bounds = jnp.stack([start_v, len_v], axis=1)  # [B, 2]

    # NOTE: index maps receive (grid indices..., scalar-prefetch refs) — grid
    # first, scalars last (kernel bodies receive scalars first).
    def q_map(bhi, qi, ki, bounds_ref):
        return (bhi, qi, 0)

    def kv_map(bhi, qi, ki, bounds_ref):
        # clamp dead blocks onto the valid range: Pallas skips the DMA when
        # the block index is unchanged between grid steps.
        bb = bhi // h
        first_valid = bounds_ref[bb, 0] // kv_block
        last_valid = jnp.maximum(
            (bounds_ref[bb, 1] + kv_block - 1) // kv_block - 1, first_valid
        )
        base = first_valid if span_grid else 0
        return (bhi, jnp.clip(base + ki, first_valid, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 128), q_map),
        ],
        scratch_shapes=(
            [pltpu.VMEM((q_block, d), jnp.float32)]
            + [pltpu.VMEM((q_block, 128), jnp.float32)] * (1 if fixedm else 2)
        ),
    )

    kernel = functools.partial(
        _flash_kernel, kv_block=kv_block, num_kv_blocks=n_kv, num_heads=h,
        fixedm=fixedm, span_grid=span_grid,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # raised VMEM cap admits q blocks past the default 16 MB scoped
            # limit (grid-dim parallel semantics measured ~5% SLOWER here,
            # so only the cap is set)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * (n_kv * kv_block) * d,
            bytes_accessed=(qb.size * 2
                            + (kb.size + vb.size) * n_kv * kv_block // skv_p)
            * qb.dtype.itemsize,
            transcendentals=b * h * sq_p * (n_kv * kv_block),
        ),
    )(bounds, qb, kb, vb)

    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :sq, 0].reshape(b, h, sq)
    return out


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    max_span: Optional[int] = None,
    kv_layout: str = "bshd",
) -> jax.Array:
    """Mask-based wrapper matching the `cache_attention` contract. The mask
    must be a prefix mask (all our masks are — cache validity and full text
    context); its population count is the prefix length. max_span: static
    upper bound on that length (span-sized grid, see
    flash_attention_prefix)."""
    skv = k.shape[2] if kv_layout == "bhsd" else k.shape[1]
    if kv_mask is None:
        kv_len = jnp.int32(skv)
    elif kv_mask.ndim == 2:
        kv_len = jnp.sum(kv_mask.astype(jnp.int32), axis=1)  # [B] per-stream
    else:
        kv_len = jnp.sum(kv_mask.astype(jnp.int32))
    return flash_attention_prefix(q, k, v, kv_len, scale=scale,
                                  max_span=max_span, kv_layout=kv_layout)


# ---------------------------------------------------------------------------
# Quantized-KV variant: int8 K/V with per-(token, head) scales, dequantized
# in-kernel via column scaling (q.(k_q*s) == (q.k_q)*s on logits, and
# p.(v_q*s) == (p*s).v_q on probabilities) — the cache's HBM traffic halves
# and no dequantized copy ever exists in HBM.
# ---------------------------------------------------------------------------

def _flash_kernel_quant(
    bounds_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    o_ref, lse_ref,
    acc_ref, *scratch,
    kv_block: int,
    num_kv_blocks: int,
    num_heads: int,
    fixedm: bool,
    span_grid: bool = False,
):
    if fixedm:
        (l_ref,) = scratch
        m_ref = None
    else:
        m_ref, l_ref = scratch
    ki = pl.program_id(2)
    batch = pl.program_id(0) // num_heads
    kv_start = bounds_ref[batch, 0]
    kv_len = bounds_ref[batch, 1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if not fixedm:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    if span_grid:
        block_start = (kv_start // kv_block + ki) * kv_block
    else:
        block_start = ki * kv_block

    def _update(s):
        if fixedm:
            # max-free softmax (see _flash_kernel): p is unnormalized but
            # bounded by the normalized-QK logit range; bf16 PV absorbs it
            p = jnp.exp2(s)
            l_ref[...] += jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
            )
        else:
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            corr = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new[:, :1])
            l_new = l_prev * corr + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
            )
        # v dequant via probability-column scaling: p*vs is a lane-aligned
        # [q_blk, kv_blk] x [1, kv_blk] broadcast (an in-kernel transpose of
        # the scales to V rows measured SLOWER — sublane relayout cost)
        p_scaled = (p * vs_ref[0]).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p_scaled, v_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if fixedm:
            acc_ref[...] += pv
        else:
            acc_ref[...] = acc_ref[...] * corr[:, :1] + pv
            m_ref[...] = m_new
            l_ref[...] = l_new

    def _logits():
        # q is pre-scaled by scale*log2(e) in the wrapper; k dequant scale is
        # applied to the logits columns (lane-aligned broadcast)
        s_ = jax.lax.dot_general(
            q_ref[0], k_ref[0].astype(q_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s_ * ks_ref[0]

    interior = (block_start >= kv_start) & (block_start + kv_block <= kv_len)

    @pl.when(interior)
    def _compute_interior():
        _update(_logits())

    @pl.when(jnp.logical_not(interior) & (block_start < kv_len)
             & (block_start + kv_block > kv_start))
    def _compute_boundary():
        s = _logits()
        col = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        _update(jnp.where((col >= kv_start) & (col < kv_len), s, NEG_INF))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[...][:, :1]
        denom = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        if fixedm:
            lse = jnp.log2(denom) / LOG2E
        else:
            lse = (m_ref[...][:, :1] + jnp.log2(denom)) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_block", "kv_block", "return_lse", "interpret",
                     "softmax", "max_span", "kv_layout"),
)
def flash_attention_prefix_quant(
    q: jax.Array,          # [B, Sq, H, D] bf16/f32
    k_q: jax.Array,        # [B, Skv, H, D] int8 (or [B, H, Skv, D], kv_layout)
    v_q: jax.Array,        # [B, Skv, H, D] int8
    k_scale: jax.Array,    # [B, Skv, H] f32 (or [B, H, Skv], kv_layout)
    v_scale: jax.Array,    # [B, Skv, H] f32
    kv_len: jax.Array,
    kv_start: jax.Array | int = 0,  # start of the valid span
    scale: Optional[float] = None,
    q_block: Optional[int] = None,
    kv_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: bool = False,
    softmax: str = "fixedm",
    max_span: Optional[int] = None,
    kv_layout: str = "bshd",
):
    """int8-KV flash attention over the span [kv_start, kv_len), bf16 PV
    with in-kernel dequant.

    softmax='fixedm' (default) is the max-free online softmax — exact for
    normalized-QK logits (see flash_attention_prefix); 'runmax' is classic.
    (The v2 int8-PV kernel cannot use fixedm: its int8 p-quantization needs
    max-normalized probabilities.)

    max_span (static): span-sized kv grid — see flash_attention_prefix.
    Caller contract: kv_len - kv_start <= max_span for every batch row."""
    if softmax not in ("fixedm", "runmax"):
        raise ValueError(f"softmax must be 'fixedm' or 'runmax', got {softmax}")
    if kv_layout not in ("bshd", "bhsd"):
        raise ValueError(f"kv_layout must be 'bshd' or 'bhsd', got {kv_layout}")
    fixedm = softmax == "fixedm"
    b, sq, h, d = q.shape
    skv = k_q.shape[2] if kv_layout == "bhsd" else k_q.shape[1]
    if scale is None:
        scale = d**-0.5
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    q_block = min(q_block, -(-sq // 16) * 16)
    if kv_block is None:
        kv_block = DEFAULT_KV_BLOCK
    kv_block = min(kv_block, max(128, -(-skv // 128) * 128))

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    def bh_scale(s):
        return s.transpose(0, 2, 1).reshape(b * h, 1, s.shape[1])

    qb = (bh(q).astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qb = _pad_to(qb, 1, q_block)
    if kv_layout == "bhsd":
        # head-major cache: folds are free contiguous reshapes
        kb = _pad_to(k_q.reshape(b * h, skv, d), 1, kv_block)
        vb = _pad_to(v_q.reshape(b * h, skv, d), 1, kv_block)
        ksb = _pad_to(k_scale.astype(jnp.float32).reshape(b * h, 1, skv),
                      2, kv_block)
        vsb = _pad_to(v_scale.astype(jnp.float32).reshape(b * h, 1, skv),
                      2, kv_block)
    else:
        kb = _pad_to(bh(k_q), 1, kv_block)
        vb = _pad_to(bh(v_q), 1, kv_block)
        ksb = _pad_to(bh_scale(k_scale.astype(jnp.float32)), 2, kv_block)
        vsb = _pad_to(bh_scale(v_scale.astype(jnp.float32)), 2, kv_block)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    n_q, n_kv = sq_p // q_block, skv_p // kv_block
    if max_span is not None:
        # +1 step covers kv_start landing mid-block
        span_steps = -(-max_span // kv_block) + 1
        if span_steps < n_kv:
            n_kv = span_steps
        else:
            max_span = None
    span_grid = max_span is not None

    # per-batch valid spans (continuous batching: each stream has its own
    # live prefix — a scalar kv_len would attend every stream over stream 0's
    # context); bounds [B, 2] = [kv_start, kv_len)
    start_v = jnp.broadcast_to(
        jnp.asarray(kv_start, jnp.int32).reshape(-1), (b,))
    len_v = jnp.broadcast_to(
        jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,))
    bounds = jnp.stack([start_v, len_v], axis=1)

    def q_map(bhi, qi, ki, bounds_ref):
        return (bhi, qi, 0)

    def _clamp(ki, bounds_ref, bb):
        first_valid = bounds_ref[bb, 0] // kv_block
        last_valid = jnp.maximum(
            (bounds_ref[bb, 1] + kv_block - 1) // kv_block - 1, first_valid
        )
        base = first_valid if span_grid else 0
        return jnp.clip(base + ki, first_valid, last_valid)

    def kv_map(bhi, qi, ki, bounds_ref):
        return (bhi, _clamp(ki, bounds_ref, bhi // h), 0)

    def scale_map(bhi, qi, ki, bounds_ref):
        return (bhi, 0, _clamp(ki, bounds_ref, bhi // h))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 128), q_map),
        ],
        scratch_shapes=(
            [pltpu.VMEM((q_block, d), jnp.float32)]
            + [pltpu.VMEM((q_block, 128), jnp.float32)] * (1 if fixedm else 2)
        ),
    )

    kernel = functools.partial(
        _flash_kernel_quant, kv_block=kv_block, num_kv_blocks=n_kv,
        num_heads=h, fixedm=fixedm, span_grid=span_grid,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # raised VMEM cap admits q blocks past the default 16 MB scoped
            # limit (grid-dim parallel semantics measured ~5% SLOWER here,
            # so only the cap is set)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * (n_kv * kv_block) * d,
            bytes_accessed=(qb.size * 2
                            + (kb.size + vb.size) * n_kv * kv_block // skv_p),
            transcendentals=b * h * sq_p * (n_kv * kv_block),
        ),
    )(bounds, qb, kb, vb, ksb, vsb)

    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :sq, 0].reshape(b, h, sq)
    return out


# ---------------------------------------------------------------------------
# Full-int8 attention compute: Q is dynamically quantized per-(token, head)
# and BOTH matmuls run on the int8 MXU path (2x bf16 throughput on v5e).
# QK: s = (q_q . k_q)_i32 * q_scale_row * k_scale_col  (scales fold softmax
# scale and the exp2-domain log2(e)); PV: p is folded with the v scales and
# re-quantized per row to int8 with a fixed row scale.
# The kernel-time budget is ~75% matmuls at bf16, so int8 compute is the
# main lever past the ~114 TF/s bf16 plateau.
# ---------------------------------------------------------------------------

def _flash_kernel_quant_i8(
    kv_len_ref,
    q_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *,
    kv_block: int,
    num_kv_blocks: int,
    num_heads: int,
):
    ki = pl.program_id(2)
    kv_len = kv_len_ref[pl.program_id(0) // num_heads]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    block_start = ki * kv_block

    def _update(s):
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new[:, :1])
        l_new = l_prev * corr + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        # fold v scales into p, requantize per row to int8
        p_v = p * vs_ref[0]                              # [q_blk, kv_blk]
        row_max = jnp.maximum(
            jnp.max(p_v, axis=-1, keepdims=True), 1e-20
        )                                                # [q_blk, 1]
        p_q = jnp.round(p_v * (127.0 / row_max)).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_q, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (row_max / 127.0)
        acc_ref[...] = acc_ref[...] * corr[:, :1] + pv
        m_ref[...] = m_new
        l_ref[...] = l_new

    def _logits():
        s_i32 = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # qs folds softmax scale * log2(e); ks is the cache dequant scale
        return s_i32.astype(jnp.float32) * qs_ref[0] * ks_ref[0]

    interior = block_start + kv_block <= kv_len

    @pl.when(interior)
    def _compute_interior():
        _update(_logits())

    @pl.when(jnp.logical_not(interior) & (block_start < kv_len))
    def _compute_boundary():
        s = _logits()
        col = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        _update(jnp.where(col < kv_len, s, NEG_INF))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[...][:, :1]
        denom = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        lse = (m_ref[...][:, :1] + jnp.log2(denom)) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_block", "kv_block", "return_lse", "interpret"),
)
def flash_attention_prefix_quant_i8(
    q: jax.Array,          # [B, Sq, H, D] bf16/f32 (quantized inside)
    k_q: jax.Array,        # [B, Skv, H, D] int8
    v_q: jax.Array,        # [B, Skv, H, D] int8
    k_scale: jax.Array,    # [B, Skv, H] f32
    v_scale: jax.Array,    # [B, Skv, H] f32
    kv_len: jax.Array,
    scale: Optional[float] = None,
    q_block: Optional[int] = None,
    kv_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: bool = False,
):
    b, sq, h, d = q.shape
    skv = k_q.shape[1]
    if scale is None:
        scale = d**-0.5
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    q_block = min(q_block, -(-sq // 32) * 32)
    if kv_block is None:
        kv_block = DEFAULT_KV_BLOCK
    kv_block = min(kv_block, max(128, -(-skv // 128) * 128))

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    def bh_scale(s_):
        return s_.transpose(0, 2, 1).reshape(b * h, 1, s_.shape[1])

    # dynamic per-(token, head) int8 quantization of q (XLA; fuses upstream)
    qf = q.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8)
    q_i8 = jnp.clip(jnp.round(qf * (127.0 / q_absmax)), -127, 127
                    ).astype(jnp.int8)
    # row scale folds dequant + softmax scale + exp2-domain log2(e)
    q_row_scale = (q_absmax / 127.0) * (scale * LOG2E)      # [B, Sq, H, 1]

    qb = _pad_to(bh(q_i8), 1, q_block)
    qs = _pad_to(
        q_row_scale[..., 0].transpose(0, 2, 1).reshape(b * h, sq, 1), 1,
        q_block,
    )
    kb = _pad_to(bh(k_q), 1, kv_block)
    vb = _pad_to(bh(v_q), 1, kv_block)
    ksb = _pad_to(bh_scale(k_scale.astype(jnp.float32)), 2, kv_block)
    vsb = _pad_to(bh_scale(v_scale.astype(jnp.float32)), 2, kv_block)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    n_q, n_kv = sq_p // q_block, skv_p // kv_block

    kv_len_arr = jnp.broadcast_to(
        jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,)
    )

    def q_map(bhi, qi, ki, kv_len_ref):
        return (bhi, qi, 0)

    def kv_map(bhi, qi, ki, kv_len_ref):
        last_valid = jnp.maximum(
            (kv_len_ref[bhi // h] + kv_block - 1) // kv_block - 1, 0
        )
        return (bhi, jnp.minimum(ki, last_valid), 0)

    def scale_map(bhi, qi, ki, kv_len_ref):
        last_valid = jnp.maximum(
            (kv_len_ref[bhi // h] + kv_block - 1) // kv_block - 1, 0
        )
        return (bhi, 0, jnp.minimum(ki, last_valid))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 1), q_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 128), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, d), jnp.float32),
            pltpu.VMEM((q_block, 128), jnp.float32),
            pltpu.VMEM((q_block, 128), jnp.float32),
        ],
    )

    def kernel(kv_len_ref, q_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
               o_ref, lse_ref, acc_ref, m_ref, l_ref):
        # qs block arrives as [1, q_block, 1]; squeeze the leading axis
        return _flash_kernel_quant_i8(
            kv_len_ref,
            q_ref, _QsView(qs_ref), k_ref, v_ref, ks_ref, vs_ref,
            o_ref, lse_ref, acc_ref, m_ref, l_ref,
            kv_block=kv_block, num_kv_blocks=n_kv, num_heads=h,
        )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # raised VMEM cap admits q blocks past the default 16 MB scoped
            # limit (grid-dim parallel semantics measured ~5% SLOWER here,
            # so only the cap is set)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=qb.size + kb.size + vb.size,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(kv_len_arr, qb, qs, kb, vb, ksb, vsb)

    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :sq, 0].reshape(b, h, sq)
    return out


class _QsView:
    """Adapter presenting a [1, q_block, 1] ref as [q_block, 1] reads."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[0]


def flash_attention_gqa(
    q: jax.Array,          # [B, Sq, Hq, D]
    k: jax.Array,          # [B, Skv, Hkv, D] with Hq % Hkv == 0
    v: jax.Array,
    kv_len: jax.Array,
    kv_start: jax.Array | int = 0,
    scale: Optional[float] = None,
    **kwargs,
):
    """Grouped-query attention without materializing repeated KV heads:
    the `rep = Hq/Hkv` query heads of a group are FOLDED INTO THE QUERY ROWS
    of their shared KV head — [B, Sq, Hq, D] -> [B, rep*Sq, Hkv, D] — so the
    standard prefix kernel runs with Hkv programs over rep-times-taller query
    blocks (better MXU utilization) and KV is read once per group instead of
    once per query head (the jnp.repeat alternative copies KV rep times)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[1] if kwargs.get("kv_layout") == "bhsd" else k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    rep = hq // hkv
    if rep == 1:
        return flash_attention_prefix(q, k, v, kv_len, kv_start, scale,
                                      **kwargs)
    return_lse = kwargs.pop("return_lse", False)
    qg = q.reshape(b, sq, hkv, rep, d).transpose(0, 3, 1, 2, 4)
    qg = qg.reshape(b, rep * sq, hkv, d)
    res = flash_attention_prefix(qg, k, v, kv_len, kv_start, scale,
                                 return_lse=return_lse, **kwargs)
    out, lse = res if return_lse else (res, None)
    out = out.reshape(b, rep, sq, hkv, d).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, sq, hq, d)
    if return_lse:
        # folded rows are rep-major: [B, hkv, rep*sq] -> [B, hkv, rep, sq]
        # -> [B, Hq, Sq] with head hq = khead*rep + r (matching the q fold)
        lse = lse.reshape(b, hkv, rep, sq).reshape(b, hq, sq)
        return out, lse
    return out


def flash_attention_gqa_quant(
    q: jax.Array,          # [B, Sq, Hq, D] bf16/f32
    k_q: jax.Array,        # [B, Skv, Hkv, D] int8
    v_q: jax.Array,
    k_scale: jax.Array,    # [B, Skv, Hkv] f32
    v_scale: jax.Array,
    kv_len: jax.Array,
    kv_start: jax.Array | int = 0,
    scale: Optional[float] = None,
    **kwargs,
):
    """GQA fold (see flash_attention_gqa) over the int8-KV span kernel.

    This is the MAGI window-attention serving path: int8 KV dequantizes via
    logit/probability column scaling at bf16-kernel speed (157 vs 78 TF/s
    for the e4m3 cast-only cache at the 4.5B window shape,
    exp/r4_magi_attn.py)."""
    b, sq, hq, d = q.shape
    hkv = k_q.shape[1] if kwargs.get("kv_layout") == "bhsd" else k_q.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    rep = hq // hkv
    if rep == 1:
        return flash_attention_prefix_quant(
            q, k_q, v_q, k_scale, v_scale, kv_len, kv_start, scale, **kwargs)
    if kwargs.get("return_lse"):
        raise NotImplementedError("return_lse under the GQA quant fold")
    qg = q.reshape(b, sq, hkv, rep, d).transpose(0, 3, 1, 2, 4)
    qg = qg.reshape(b, rep * sq, hkv, d)
    out = flash_attention_prefix_quant(
        qg, k_q, v_q, k_scale, v_scale, kv_len, kv_start, scale, **kwargs)
    out = out.reshape(b, rep, sq, hkv, d).transpose(0, 2, 3, 1, 4)
    return out.reshape(b, sq, hq, d)


# ---------------------------------------------------------------------------
# Quantized-KV v2: int8 PV matmul with per-kv-block V scales.
# Round-1's full-int8 kernel lost to bf16 because requantizing p needed a
# per-row max reduce + divide (VPU tax) and the QK int8 dot at contraction
# K=128 gains nothing on the MXU. v2 keeps QK in bf16 (K=128) but runs PV
# on the int8 MXU path where the contraction is kv_block (>=2048) deep:
# p in [0,1] after the online softmax, so folding the per-token V scales
# NORMALIZED by the block max (ratio <= 1) keeps p*ratio in [0,1] and a
# FIXED 127 quantization scale works — no row reduce, no divide:
#   out_block = (sum_t round(p_t * vs_t/vsb * 127) * v_q_t) * vsb/127
# ---------------------------------------------------------------------------

def _flash_kernel_quant_v2(
    kv_len_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *,
    kv_block: int,
    num_kv_blocks: int,
    num_heads: int,
):
    ki = pl.program_id(2)
    kv_len = kv_len_ref[pl.program_id(0) // num_heads]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    block_start = ki * kv_block

    def _update(s):
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new[:, :1])
        l_new = l_prev * corr + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        vs_row = vs_ref[0]                              # [1, kv_blk]
        vsb = jnp.maximum(jnp.max(vs_row), 1e-20)       # block max (scalar)
        ratio127 = vs_row * (127.0 / vsb)               # [1, kv_blk]
        p_q = jnp.round(p * ratio127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_q, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (vsb / 127.0)
        acc_ref[...] = acc_ref[...] * corr[:, :1] + pv
        m_ref[...] = m_new
        l_ref[...] = l_new

    def _logits():
        s_ = jax.lax.dot_general(
            q_ref[0], k_ref[0].astype(q_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s_ * ks_ref[0]

    interior = block_start + kv_block <= kv_len

    @pl.when(interior)
    def _compute_interior():
        _update(_logits())

    @pl.when(jnp.logical_not(interior) & (block_start < kv_len))
    def _compute_boundary():
        s = _logits()
        col = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        _update(jnp.where(col < kv_len, s, NEG_INF))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[...][:, :1]
        denom = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        lse = (m_ref[...][:, :1] + jnp.log2(denom)) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_block", "kv_block", "return_lse", "interpret"),
)
def flash_attention_prefix_quant_v2(
    q: jax.Array,          # [B, Sq, H, D] bf16/f32
    k_q: jax.Array,        # [B, Skv, H, D] int8
    v_q: jax.Array,        # [B, Skv, H, D] int8
    k_scale: jax.Array,    # [B, Skv, H] f32
    v_scale: jax.Array,    # [B, Skv, H] f32
    kv_len: jax.Array,     # scalar or [B] int32
    scale: Optional[float] = None,
    q_block: Optional[int] = None,
    kv_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: bool = False,
):
    b, sq, h, d = q.shape
    skv = k_q.shape[1]
    if scale is None:
        scale = d**-0.5
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    q_block = _fit_block(sq, q_block)
    if kv_block is None:
        kv_block = DEFAULT_KV_BLOCK
    kv_block = min(kv_block, max(128, -(-skv // 128) * 128))

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    def bh_scale(s_):
        return s_.transpose(0, 2, 1).reshape(b * h, 1, s_.shape[1])

    qb = (bh(q).astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qb = _pad_to(qb, 1, q_block)
    kb = _pad_to(bh(k_q), 1, kv_block)
    vb = _pad_to(bh(v_q), 1, kv_block)
    ksb = _pad_to(bh_scale(k_scale.astype(jnp.float32)), 2, kv_block)
    vsb = _pad_to(bh_scale(v_scale.astype(jnp.float32)), 2, kv_block)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    n_q, n_kv = sq_p // q_block, skv_p // kv_block

    kv_len_arr = jnp.broadcast_to(
        jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,)
    )

    def q_map(bhi, qi, ki, kv_len_ref):
        return (bhi, qi, 0)

    def kv_map(bhi, qi, ki, kv_len_ref):
        last_valid = jnp.maximum(
            (kv_len_ref[bhi // h] + kv_block - 1) // kv_block - 1, 0
        )
        return (bhi, jnp.minimum(ki, last_valid), 0)

    def scale_map(bhi, qi, ki, kv_len_ref):
        last_valid = jnp.maximum(
            (kv_len_ref[bhi // h] + kv_block - 1) // kv_block - 1, 0
        )
        return (bhi, 0, jnp.minimum(ki, last_valid))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
            pl.BlockSpec((1, 1, kv_block), scale_map),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 128), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, d), jnp.float32),
            pltpu.VMEM((q_block, 128), jnp.float32),
            pltpu.VMEM((q_block, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _flash_kernel_quant_v2, kv_block=kv_block, num_kv_blocks=n_kv,
        num_heads=h,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # raised VMEM cap admits q blocks past the default 16 MB scoped
            # limit (grid-dim parallel semantics measured ~5% SLOWER here,
            # so only the cap is set)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=qb.size * 2 + kb.size + vb.size,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(kv_len_arr, qb, kb, vb, ksb, vsb)

    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :sq, 0].reshape(b, h, sq)
    return out
