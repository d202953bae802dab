"""Attention ops: XLA reference implementation + memory-bounded chunked
online-softmax variant, plus the dispatch wrapper used by the models.

These replace the reference's FlashAttention-2/3 + FlashInfer backend registry
(`inferix/models/attention/backends.py`, `flash_attention.py:42-200`) with a
single uniform entry point. On TPU the hot path is the Pallas kernel in
`inferix_tpu/ops/flash_attention.py`; the XLA paths here are the portable
fallback (CPU tests, tiny shapes) and the numerics oracle for kernel tests.

All variants return (out, lse) so partial results can be merged across ring
steps exactly as the reference merges with the log-sum-exp trick
(`inferix/models/attention/distributed.py:30-48`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Plain masked attention, fp32 softmax. O(Sq*Skv) memory.

    q: [B, Sq, H, D]; k, v: [B, Skv, H, D]; kv_mask: [B, Skv] or [Skv] bool
    (True = attend). Returns (out [B, Sq, H, D] in q.dtype, lse [B, H, Sq] fp32).
    """
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if kv_mask is not None:
        m = kv_mask if kv_mask.ndim == 2 else kv_mask[None, :]
        logits = jnp.where(m[:, None, None, :], logits, -jnp.inf)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    probs = jnp.exp(logits - lse[..., None])
    # Fully-masked rows (no valid kv) produce nan via (-inf) - (-inf); zero them.
    probs = jnp.nan_to_num(probs)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), lse


def attention_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    chunk_size: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Online-softmax attention scanning over KV chunks — O(Sq*chunk) memory.

    Same contract as attention_reference. This is the XLA "flash" fallback
    used when the Pallas kernel is unavailable (CPU mesh tests).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if skv <= chunk_size:
        return attention_reference(q, k, v, kv_mask, scale)

    num_chunks = -(-skv // chunk_size)
    pad = num_chunks * chunk_size - skv
    if kv_mask is None:
        kv_mask = jnp.ones((b, skv), dtype=bool)
    elif kv_mask.ndim == 1:
        kv_mask = jnp.broadcast_to(kv_mask[None, :], (b, skv))
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))

    kc = k.reshape(b, num_chunks, chunk_size, h, d).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(b, num_chunks, chunk_size, h, d).transpose(1, 0, 2, 3, 4)
    mc = kv_mask.reshape(b, num_chunks, chunk_size).transpose(1, 0, 2)

    def body(carry, inputs):
        acc, m_run, l_run = carry  # acc [B,Q,H,D] f32, m/l [B,H,Q] f32
        kk, vv, mm = inputs
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, kk,
                       preferred_element_type=jnp.float32)
            * scale
        )
        logits = jnp.where(mm[:, None, None, :], logits, -jnp.inf)
        m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1))
        # guard: all -inf so far -> keep -inf but avoid nan in exp corrections
        corr = jnp.exp(jnp.where(jnp.isfinite(m_run), m_run - m_new, -jnp.inf))
        corr = jnp.nan_to_num(corr)
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.nan_to_num(p)
        l_new = l_run * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vv.dtype), vv,
                        preferred_element_type=jnp.float32)
        acc_new = acc * corr.transpose(0, 2, 1)[..., None] + pv
        return (acc_new, m_new, l_new), None

    acc0 = jnp.zeros((b, sq, h, d), jnp.float32)
    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    (acc, m_run, l_run), _ = jax.lax.scan(body, (acc0, m0, l0), (kc, vc, mc))
    denom = jnp.maximum(l_run, 1e-30)
    out = acc / denom.transpose(0, 2, 1)[..., None]
    lse = m_run + jnp.log(denom)
    return out.astype(q.dtype), lse


def merge_attention_partials(
    outs: jax.Array, lses: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Merge N partial attention results with the LSE trick.

    outs: [N, B, Sq, H, D]; lses: [N, B, H, Sq].
    Used by ring attention to combine per-ring-step partial outputs
    (reference `distributed.py:30-48 update_out_and_lse_pass_q`).
    """
    m = jnp.max(lses, axis=0)                    # [B, H, Sq]
    w = jnp.exp(lses - m[None])                  # [N, B, H, Sq]
    denom = jnp.sum(w, axis=0)
    w_t = (w / denom[None]).transpose(0, 1, 3, 2)[..., None]  # [N,B,Sq,H,1]
    out = jnp.sum(outs.astype(jnp.float32) * w_t, axis=0)
    lse = m + jnp.log(denom)
    return out.astype(outs.dtype), lse


def cache_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    max_span: Optional[int] = None,
    kv_layout: str = "bshd",
    logical_kv: Optional[int] = None,
) -> jax.Array:
    """Dispatcher: Pallas flash kernel on TPU, chunked XLA elsewhere.

    The models call this for both self-attention over the KV cache and
    cross-attention over text keys. Pass k_scale/v_scale ([B, Skv, H] f32)
    when k/v are an int8-quantized KV cache. max_span (static): host-known
    upper bound on the mask's prefix length — activates the span-sized
    Pallas grid (flash_attention_prefix max_span); ignored off-TPU.
    kv_layout='bhsd': k/v (and scales) arrive head-major ([B, H, Skv, D] /
    [B, H, Skv]) from a `KVCacheSpec.head_major` cache — the Pallas kernels
    fold them for free; the XLA fallbacks transpose back (CPU-only cost).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    kv_seq_axis = 2 if kv_layout == "bhsd" else 1

    # logical_kv (static): the cache's LOGICAL window when its allocation is
    # padded to a kv_block multiple (KVCacheSpec.alloc_tokens). The Pallas
    # kernels see identical shapes either way (they pad to the same multiple
    # in-kernel), but the XLA fallback's chunk partition — and with it the
    # softmax reduction ORDER — would change with the padded length; slicing
    # back to the logical window keeps the fallback bit-equal to the
    # exact-size cache. Slots past logical_kv are never valid, so this drops
    # only masked rows.
    if (not use_pallas and logical_kv is not None
            and logical_kv < k.shape[kv_seq_axis]):
        sl = [slice(None)] * k.ndim
        sl[kv_seq_axis] = slice(0, logical_kv)
        k = k[tuple(sl)]
        v = v[tuple(sl)]
        if k_scale is not None:
            k_scale = k_scale[tuple(sl[:-1])]
            v_scale = v_scale[tuple(sl[:-1])]
        if kv_mask is not None:
            kv_mask = kv_mask[..., :logical_kv]

    if k_scale is not None:
        if use_pallas:
            # v1 (bf16 PV, in-kernel dequant) with the max-free softmax:
            # 6.16 ms at full cache vs v2 int8-PV runmax 7.50 and v1 runmax
            # 8.29 — the fixedm VPU savings flipped the v1/v2 ordering
            # (v2's int8 p-quantization needs max-normalized probabilities,
            # so it cannot take fixedm). bf16 KV remains fastest at 5.89;
            # int8 KV buys HBM capacity at ~5% attention cost.
            from .flash_attention import flash_attention_prefix_quant

            if kv_mask is None:
                kv_len = jnp.int32(k.shape[kv_seq_axis])
            elif kv_mask.ndim == 2:
                # per-stream prefix lengths (continuous batching)
                kv_len = jnp.sum(kv_mask.astype(jnp.int32), axis=1)
            else:
                kv_len = jnp.sum(kv_mask.astype(jnp.int32))
            return flash_attention_prefix_quant(
                q, k, v, k_scale, v_scale, kv_len, scale=scale,
                max_span=max_span, kv_layout=kv_layout,
            )
        # XLA fallback: dequantize then attend
        k = k.astype(jnp.float32) * k_scale[..., None].astype(jnp.float32)
        v = v.astype(jnp.float32) * v_scale[..., None].astype(jnp.float32)
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)

    # Small-KV attention (cross-attention over 512 text tokens) is cheaper as
    # fused XLA ops than as a Pallas kernel launch (measured 0.58 vs 0.75 ms
    # at kv=512): below this threshold the unfused logits fit comfortably and
    # XLA fuses the softmax into the matmuls. The unfused path materializes
    # f32 logits [B, H, Sq, Skv], so it is gated on that tensor's size too —
    # MAGI's window forward (Sq = 4x12150, 24 heads, 800 caption tokens) hit
    # a 3.48 GB logits temp here and OOM'd the 4.5B model off one v5e.
    # The threshold uses the LOGICAL window when the allocation is padded
    # (kv_alloc_pad): a small window stays on the fused-XLA path whether or
    # not its allocation is rounded up, so padding never changes the compute
    # path (and with it the reduction order) of a small-KV attention.
    skv = k.shape[kv_seq_axis] if logical_kv is None else logical_kv
    logits_bytes = 4 * q.shape[0] * q.shape[2] * q.shape[1] * skv
    if use_pallas and (skv > 1024 or logits_bytes > 256 * 2**20):
        from .flash_attention import flash_attention as pallas_flash

        return pallas_flash(q, k, v, kv_mask=kv_mask, scale=scale,
                            max_span=max_span, kv_layout=kv_layout)
    if use_pallas and logical_kv is not None and logical_kv < k.shape[kv_seq_axis]:
        # Taking the fused-XLA path on TPU with a padded allocation: slice
        # back to the logical window (same bit-equality argument as the
        # fallback slice above — padded slots are never valid).
        sl = [slice(None)] * k.ndim
        sl[kv_seq_axis] = slice(0, logical_kv)
        k = k[tuple(sl)]
        v = v[tuple(sl)]
        if kv_mask is not None:
            kv_mask = kv_mask[..., :logical_kv]
    if k.dtype == jnp.float8_e4m3fn:
        # Non-kernel paths: cast-only dequant of the fp8 KV cache
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    if kv_layout == "bhsd":
        # XLA paths take token-major [B, Skv, H, D] (CPU tests / tiny KV)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    if use_pallas:
        out, _ = attention_reference(q, k, v, kv_mask=kv_mask, scale=scale)
        return out
    out, _ = attention_chunked(q, k, v, kv_mask=kv_mask, scale=scale)
    return out
