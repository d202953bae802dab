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

    @property
    def ring_tokens(self) -> int:
        return self.max_tokens - self.sink_tokens


class KVCache(NamedTuple):
    """Device state. Donate-friendly: the step function threads it through."""

    k: jax.Array  # [L, B, S, H, D]
    v: jax.Array  # [L, B, S, H, D]


def init_kv_cache(spec: KVCacheSpec) -> KVCache:
    shape = (
        spec.num_layers,
        spec.batch,
        spec.max_tokens,
        spec.num_kv_heads,
        spec.head_dim,
    )
    return KVCache(
        k=jnp.zeros(shape, dtype=spec.dtype),
        v=jnp.zeros(shape, dtype=spec.dtype),
    )


def position_to_slot(spec: KVCacheSpec, pos: jax.Array) -> jax.Array:
    """Map logical token positions to cache slots (pure function)."""
    if not spec.ring:
        return pos
    sink = spec.sink_tokens
    ring = spec.ring_tokens
    return jnp.where(pos < spec.max_tokens, pos, sink + (pos - sink) % ring)


def write_block(
    spec: KVCacheSpec,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    current_start: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Write a contiguous block of new tokens into one layer's cache.

    k_cache/v_cache: [B, S, H, D]; k_new/v_new: [B, n, H, D];
    current_start: traced int32 logical position of the block's first token.
    """
    n = k_new.shape[1]
    if not spec.ring:
        # Contiguous dynamic-update-slice in slot space (common path; the
        # pipeline guarantees current_start + n <= S when ring is off).
        start = (jnp.zeros((), jnp.int32), current_start.astype(jnp.int32),
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), start)
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), start)
        return k_cache, v_cache
    pos = current_start.astype(jnp.int32) + jnp.arange(n, dtype=jnp.int32)
    slots = position_to_slot(spec, pos)
    k_cache = k_cache.at[:, slots].set(k_new.astype(k_cache.dtype))
    v_cache = v_cache.at[:, slots].set(v_new.astype(v_cache.dtype))
    return k_cache, v_cache


def valid_mask(
    spec: KVCacheSpec, current_end: jax.Array
) -> jax.Array:
    """[S] bool: which slots hold live tokens once positions [0, current_end)
    have been written."""
    idx = jnp.arange(spec.max_tokens, dtype=jnp.int32)
    return idx < jnp.minimum(current_end.astype(jnp.int32), spec.max_tokens)


class CrossAttnCache(NamedTuple):
    """Per-layer projected text K/V, computed once per prompt.

    The reference computes these lazily behind an `is_init` flag
    (`wan_base/model.py:79-95`); here they are produced eagerly by a
    dedicated precompute pass, which removes mutable-state flags from the
    jitted hot loop.
    """

    k: jax.Array  # [L, B, text_len, H, D]
    v: jax.Array  # [L, B, text_len, H, D]
