"""Functional KV cache for the semi-AR denoise loop.

Design: a preallocated ring buffer per layer, `k/v: [L, B, S, H, D]`, written
with `dynamic_update_slice` (global window) or a modular scatter (rolling
window), attended with a validity mask `slot < current_end`. This reproduces
the reference's rolling-window + attention-sink semantics
(`inferix/models/self_forcing/causal_model.py:279-304`: left-shift eviction of
oldest tokens with `sink_size` frames pinned, tracked by
global_end_index/local_end_index) with zero data movement — eviction is
overwrite, ordering is irrelevant to attention, and the validity mask
`slot < current_end` is exactly the set of live tokens in both regimes:

* global window (`local_attn_size == -1`, cache holds the whole clip): slots
  are logical positions; written slots are `< current_end`.
* rolling window: slot j in the ring region is first written by logical
  position j (so valid iff `current_end > j`) and thereafter always holds the
  latest position congruent to it that is `< current_end` — i.e. the window
  contents plus pinned sink tokens, matching the reference cache after its
  shift-eviction.

Because the mapping position->slot is a pure function, no index state needs to
be carried between steps; the cache state is just (k, v).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KVCacheSpec:
    """Static geometry of a model's self-attention cache."""

    num_layers: int
    batch: int
    max_tokens: int      # S: window cap in tokens (e.g. 32760 = 21 frames)
    num_kv_heads: int
    head_dim: int
    sink_tokens: int = 0  # pinned prefix (sink_size frames * frame_seq_length)
    ring: bool = False    # True iff rolling window (local_attn_size != -1)
    dtype: jnp.dtype = jnp.bfloat16
    # int8 KV cache (the reference never implemented a quantized KV cache —
    # BASELINE.json requires it): values stored int8 with per-(token, head)
    # scales; attention dequantizes in-kernel via logit/probability column
    # scaling, so the cache's HBM traffic halves.
    quantized: bool = False
    # Head-major storage: cache laid out [L, B, H, S, D] (scales [L, B, H, S])
    # instead of token-major [L, B, S, H, D]. The flash kernels fold operands
    # to [B*H, S, D]; head-major makes that fold a FREE contiguous reshape,
    # where token-major pays a physical transpose copy of the full per-layer
    # cache slice per forward (pallas_call operands can't fuse the transpose
    # away — BASELINE.md round-3 item 5, A/B in exp/r7_cache_layout.py). The
    # write-side transpose moves to the small new block instead (~14x less
    # traffic at the 1.3B serving shape).
    head_major: bool = False
    # Ring-write granule (tokens). When >0 every ring write's position and
    # length are multiples of it (the Wan pipeline writes whole frames), and
    # granule | ring_tokens, granule | sink_tokens — so a block write wraps
    # only at granule boundaries and lowers to n//granule static-size
    # dynamic_update_slices instead of a scatter. The scatter lowering made
    # XLA materialize layout-changed copies of the ENTIRE stacked cache
    # around the layer-scan carry (2 x 3.21 GB + 2 x 1.07 GB padded scale
    # copies at int8 B=3 window-12 — the difference between B=1 and B=4
    # fitting on a 15.75 GB v5e; see BASELINE.md round-2 capacity notes).
    granule: int = 0
    # Physical slot count (array S dim). 0 => max_tokens. Rounding this up
    # to a multiple of the flash kernel's kv_block (2048) makes the kernel's
    # per-layer K/V pad a NO-OP: at the 1.3B full-cache shape the pad ops
    # rewrite 2 x 100 MB per layer and show up at ~9 ms/forward in the
    # round-3 trace (exp/r6_results/op_breakdown.log %pad.83/84). Slots in
    # [max_tokens, alloc_tokens) are never written and never attended (the
    # kernels mask by the live-prefix bound, the XLA path by valid_mask), so
    # generation is bit-equal either way. All ring/position arithmetic stays
    # on the LOGICAL max_tokens.
    alloc_tokens: int = 0

    def __post_init__(self):
        # A physical allocation SMALLER than the logical window would
        # silently truncate the cache and break every write/mask bound.
        if self.alloc_tokens and self.alloc_tokens < self.max_tokens:
            raise ValueError(
                f"alloc_tokens ({self.alloc_tokens}) must be 0 or >= "
                f"max_tokens ({self.max_tokens})"
            )

    @property
    def slots(self) -> int:
        """Physical per-layer cache rows (>= max_tokens)."""
        return self.alloc_tokens or self.max_tokens

    @property
    def ring_tokens(self) -> int:
        return self.max_tokens - self.sink_tokens


class KVCache(NamedTuple):
    """Device state. Donate-friendly: the step function threads it through.

    When the spec is quantized, k/v are int8 and k_scale/v_scale hold
    per-(token, head) dequant scales [L, B, S, H]; otherwise the scale
    fields are None.
    """

    k: jax.Array  # [L, B, S, H, D]
    v: jax.Array  # [L, B, S, H, D]
    k_scale: Optional[jax.Array] = None  # [L, B, S, H] f32
    v_scale: Optional[jax.Array] = None


def init_kv_cache(spec: KVCacheSpec) -> KVCache:
    if spec.head_major:
        shape = (
            spec.num_layers,
            spec.batch,
            spec.num_kv_heads,
            spec.slots,
            spec.head_dim,
        )
    else:
        shape = (
            spec.num_layers,
            spec.batch,
            spec.slots,
            spec.num_kv_heads,
            spec.head_dim,
        )
    if spec.quantized:
        sshape = shape[:-1]
        return KVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(sshape, dtype=jnp.float32),
            v_scale=jnp.zeros(sshape, dtype=jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype=spec.dtype),
        v=jnp.zeros(shape, dtype=spec.dtype),
    )


def quantize_kv_block(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: [B, n, H, D] -> (int8 values, per-(token, head) scale [B, n, H])."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def position_to_slot(spec: KVCacheSpec, pos: jax.Array) -> jax.Array:
    """Map logical token positions to cache slots (pure function)."""
    if not spec.ring:
        return pos
    sink = spec.sink_tokens
    ring = spec.ring_tokens
    return jnp.where(pos < spec.max_tokens, pos, sink + (pos - sink) % ring)


def _write_one(spec: KVCacheSpec, cache: jax.Array, new: jax.Array,
               current_start: jax.Array) -> jax.Array:
    """Write [B, n, ...] into [B, S, ...] at logical position current_start.

    current_start may be a scalar (all batch slots at the same position) or
    a [B] vector (continuous batching: each stream at its own block)."""
    n = new.shape[1]
    if cache.dtype == jnp.float8_e4m3fn:
        # fp8 KV cache: scale-free e4m3 storage (clip to the finite range —
        # e4m3fn has no inf, overflow would land on nan)
        new = jnp.clip(new.astype(jnp.float32), -448.0, 448.0
                       ).astype(cache.dtype)
    else:
        new = new.astype(cache.dtype)
    start = jnp.asarray(current_start, jnp.int32)
    # Ring writes lower to per-granule dynamic_update_slices whenever the
    # block is granule-aligned (always true for the Wan pipeline: blocks are
    # whole frames): a contiguous block wraps the ring only at granule
    # boundaries, so each granule piece is itself contiguous in slot space.
    # The scatter fallback (`.at[slots].set`) forces XLA to materialize
    # layout-changed copies of the ENTIRE stacked cache around the layer-scan
    # carry — ~1.7x the cache set in extra HBM (measured, BASELINE.md).
    g = spec.granule
    use_dus_ring = spec.ring and g > 0 and n % g == 0 \
        and spec.ring_tokens % g == 0 and spec.sink_tokens % g == 0
    if start.ndim == 1:
        # per-slot positions: vmap the single-slot write over batch
        def write_slot(c_b, new_b, st):
            if not spec.ring:
                idx = (st,) + tuple(jnp.zeros((), jnp.int32)
                                    for _ in range(c_b.ndim - 1))
                return jax.lax.dynamic_update_slice(c_b, new_b, idx)
            if use_dus_ring:
                zeros = tuple(jnp.zeros((), jnp.int32)
                              for _ in range(c_b.ndim - 1))
                for i in range(n // g):
                    slot0 = position_to_slot(spec, st + i * g)
                    c_b = jax.lax.dynamic_update_slice(
                        c_b, new_b[i * g:(i + 1) * g], (slot0,) + zeros)
                return c_b
            pos = st + jnp.arange(n, dtype=jnp.int32)
            slots = position_to_slot(spec, pos)
            return c_b.at[slots].set(new_b)

        return jax.vmap(write_slot)(cache, new, start)
    if not spec.ring:
        # Contiguous dynamic-update-slice in slot space (common path; the
        # pipeline guarantees current_start + n <= S when ring is off).
        idx = (jnp.zeros((), jnp.int32), start) + \
            tuple(jnp.zeros((), jnp.int32) for _ in range(cache.ndim - 2))
        return jax.lax.dynamic_update_slice(cache, new, idx)
    if use_dus_ring:
        zeros = tuple(jnp.zeros((), jnp.int32)
                      for _ in range(cache.ndim - 2))
        for i in range(n // g):
            slot0 = position_to_slot(spec, start + i * g)
            cache = jax.lax.dynamic_update_slice(
                cache, new[:, i * g:(i + 1) * g],
                (jnp.zeros((), jnp.int32), slot0) + zeros)
        return cache
    pos = start + jnp.arange(n, dtype=jnp.int32)
    slots = position_to_slot(spec, pos)
    return cache.at[:, slots].set(new)


def _write_one_head_major(spec: KVCacheSpec, cache: jax.Array,
                          new: jax.Array, current_start: jax.Array):
    """Head-major write: cache [B, H, S, ...], new [B, n, H, ...] (token-major
    as produced by the projections). Transposes the SMALL new block to
    head-major and folds (B, H) into a pseudo-batch so `_write_one`'s
    seq-at-axis-1 slot logic applies unchanged (the fold is a free reshape)."""
    b, h = cache.shape[0], cache.shape[1]
    new_hm = jnp.swapaxes(new, 1, 2)                       # [B, H, n, ...]
    c2 = cache.reshape((b * h,) + cache.shape[2:])
    n2 = new_hm.reshape((b * h,) + new_hm.shape[2:])
    start = jnp.asarray(current_start, jnp.int32)
    if start.ndim == 1:
        start = jnp.repeat(start, h)                       # [B] -> [B*H]
    return _write_one(spec, c2, n2, start).reshape(cache.shape)


def write_block(
    spec: KVCacheSpec,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    current_start: jax.Array,
    k_scale_cache: Optional[jax.Array] = None,
    v_scale_cache: Optional[jax.Array] = None,
):
    """Write a contiguous block of new tokens into one layer's cache.

    k_cache/v_cache: [B, S, H, D] ([B, H, S, D] when spec.head_major);
    k_new/v_new: [B, n, H, D] (unquantized, always token-major);
    current_start: traced int32 logical position of the block's first token.
    Quantized specs also update the per-(token, head) scale caches and return
    a 4-tuple; plain specs return a 2-tuple.
    """
    w = _write_one_head_major if spec.head_major else _write_one
    if spec.quantized:
        k_q, k_s = quantize_kv_block(k_new)
        v_q, v_s = quantize_kv_block(v_new)
        return (
            w(spec, k_cache, k_q, current_start),
            w(spec, v_cache, v_q, current_start),
            w(spec, k_scale_cache, k_s, current_start),
            w(spec, v_scale_cache, v_s, current_start),
        )
    return (
        w(spec, k_cache, k_new, current_start),
        w(spec, v_cache, v_new, current_start),
    )


def valid_mask(
    spec: KVCacheSpec, current_end: jax.Array
) -> jax.Array:
    """Which slots hold live tokens once positions [0, current_end) have been
    written. current_end scalar -> [S]; [B] vector -> [B, S] (continuous
    batching: each stream has its own live prefix)."""
    idx = jnp.arange(spec.slots, dtype=jnp.int32)
    end = jnp.asarray(current_end, jnp.int32)
    if end.ndim == 1:
        return idx[None, :] < jnp.minimum(end, spec.max_tokens)[:, None]
    return idx < jnp.minimum(end, spec.max_tokens)


class CrossAttnCache(NamedTuple):
    """Per-layer projected text K/V, computed once per prompt.

    The reference computes these lazily behind an `is_init` flag
    (`wan_base/model.py:79-95`); here they are produced eagerly by a
    dedicated precompute pass, which removes mutable-state flags from the
    jitted hot loop. For i2v models, k_img/v_img hold the CLIP image-token
    K/V (reference `WanI2VCrossAttention`, `wan_base/model.py:105-147`).
    """

    k: jax.Array  # [L, B, text_len, H, D]
    v: jax.Array  # [L, B, text_len, H, D]
    k_img: Optional[jax.Array] = None  # [L, B, 257, H, D]
    v_img: Optional[jax.Array] = None
