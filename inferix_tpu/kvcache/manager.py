"""Request-level KV cache manager.

Behavioral parity with the reference's generic manager
(`inferix/kvcache_manager/kvcache_manager.py:56-243`: per-request allocation,
free / free-before-VAE, host offload) and its per-request batching pattern
(one `KVCacheRequest` per sample, `pipeline/self_forcing/pipeline.py:386-391`)
— re-designed for a functional device cache:

The device state is ONE batched cache pytree (`KVCache` with a fixed batch
axis). Requests claim batch SLOTS; admission/retirement of concurrent streams
reuses slots without any reallocation or recompilation (the continuous-
batching primitive BASELINE.json config #5 requires). "Freeing" a request
zeroes its row; "free before VAE" drops the whole device cache (the arrays
are donated back on the next init). Host offload round-trips the pytree
through pinned host memory via jax.device_put.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from .cache import KVCache, KVCacheSpec, init_kv_cache


# Donated in-place cache mutations: the eager `.at[].set` forms allocate a
# SECOND full cache (a transient 2x — 11.2 GB for the 1.3B model) before the
# old one is released; donation lets XLA write in place.

@functools.partial(jax.jit, donate_argnums=0, static_argnums=1)
def _zero_slot_donated(cache, slot: int):
    return jax.tree.map(
        lambda x: x.at[:, slot].set(jnp.zeros((), x.dtype)), cache)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=1)
def _zero_layer_donated(cache, layer_idx: int):
    return jax.tree.map(
        lambda x: x.at[layer_idx].set(jnp.zeros((), x.dtype)), cache)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(3, 4))
def _set_range_donated(cache, k_data, v_data, layer_idx: int, slot: int,
                       start=0):
    if cache.k_scale is not None:
        # int8 cache: quantize the float range and update the
        # per-(token, head) scale rows — casting floats straight to int8
        # would truncate [-1, 1] activations to {-1, 0, 1} and leave stale
        # scales behind
        from .cache import quantize_kv_block

        k_q, k_s = quantize_kv_block(k_data[None])
        v_q, v_s = quantize_kv_block(v_data[None])
        return cache._replace(
            k=jax.lax.dynamic_update_slice(
                cache.k, k_q[None], (layer_idx, slot, start, 0, 0)),
            v=jax.lax.dynamic_update_slice(
                cache.v, v_q[None], (layer_idx, slot, start, 0, 0)),
            k_scale=jax.lax.dynamic_update_slice(
                cache.k_scale, k_s[None], (layer_idx, slot, start, 0)),
            v_scale=jax.lax.dynamic_update_slice(
                cache.v_scale, v_s[None], (layer_idx, slot, start, 0)),
        )
    return cache._replace(
        k=jax.lax.dynamic_update_slice(
            cache.k, k_data[None, None].astype(cache.k.dtype),
            (layer_idx, slot, start, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_data[None, None].astype(cache.v.dtype),
            (layer_idx, slot, start, 0, 0)),
    )


@dataclasses.dataclass
class KVCacheRequest:
    """Handle for one generation stream (reference `KVCacheRequest`)."""

    request_id: str


class KVCacheManager:
    """Slot allocator over a batched functional KV cache."""

    def __init__(self, spec: KVCacheSpec):
        self.spec = spec
        self.max_requests = spec.batch
        self._slots: Dict[str, int] = {}
        self._free_slots = list(range(self.max_requests))
        self._cache: Optional[KVCache] = None
        self._host_cache: Optional[KVCache] = None

    # -- request lifecycle --------------------------------------------------

    def allocate_slots(self, request: KVCacheRequest) -> int:
        """Claim a batch slot for a request (idempotent)."""
        if request.request_id in self._slots:
            return self._slots[request.request_id]
        if not self._free_slots:
            raise RuntimeError(
                f"no free KV cache slots (max {self.max_requests} concurrent "
                f"requests); free() a finished stream first"
            )
        slot = self._free_slots.pop(0)
        self._slots[request.request_id] = slot
        if self._cache is not None:
            self._zero_slot(slot)
        return slot

    def slot_of(self, request: KVCacheRequest) -> int:
        return self._slots[request.request_id]

    def free(self, request: KVCacheRequest) -> None:
        """Retire a request; its slot becomes claimable and its row is zeroed."""
        slot = self._slots.pop(request.request_id, None)
        if slot is None:
            return
        self._free_slots.append(slot)
        if self._cache is not None:
            self._zero_slot(slot)

    def active_requests(self) -> List[str]:
        return list(self._slots)

    # -- cache state --------------------------------------------------------

    @property
    def cache(self) -> KVCache:
        if self._cache is None:
            self._cache = init_kv_cache(self.spec)
        return self._cache

    def update(self, cache: KVCache) -> None:
        """Store the cache returned by a jitted step (threading pattern)."""
        self._cache = cache

    def _zero_slot(self, slot: int) -> None:
        self._cache = _zero_slot_donated(self._cache, slot)

    def clear(self) -> None:
        """Free-before-VAE (reference `free`/`clear_cache` choreography,
        `CausalInferencePipeline.py:395-400`): drop the device arrays so the
        VAE decode can use the HBM."""
        self._cache = None
        self._host_cache = None

    # -- host offload -------------------------------------------------------

    def offload_to_host(self) -> None:
        """Move the cache to host memory (reference kv_offload: pinned-host
        allocation, `kvcache_manager.py:240-242`)."""
        if self._cache is None:
            return
        host = jax.device_put(
            self._cache,
            jax.tree.map(
                lambda _: jax.sharding.SingleDeviceSharding(
                    jax.devices()[0], memory_kind="pinned_host"
                ),
                self._cache,
            ),
        )
        self._host_cache = jax.block_until_ready(host)
        self._cache = None

    def restore_from_host(self) -> None:
        if self._host_cache is None:
            return
        self._cache = jax.device_put(self._host_cache, jax.devices()[0])
        self._host_cache = None

    # -- accounting ---------------------------------------------------------

    def device_bytes(self) -> int:
        if self._cache is None:
            return 0
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(self._cache))


    # -- reference API-surface parity ---------------------------------------
    # (`inferix/kvcache_manager/kvcache_manager.py:113-221`)

    def free_layer(self, layer_idx: int) -> None:
        """Zero one layer's cache across all slots (the reference's
        layer-by-layer free-before-VAE)."""
        if self._cache is None:
            return
        self._cache = _zero_layer_donated(self._cache, layer_idx)

    def _check_token_axis_api(self, name: str) -> None:
        if self.spec.head_major:
            raise NotImplementedError(
                f"KVCacheManager.{name} indexes the token axis at position "
                "2; head-major caches are an engine-forward layout — use "
                "head_major=False for token-range slab access (allocation/"
                "free/offload work in either layout)")

    def get_range(self, request: KVCacheRequest, layer_idx: int,
                  start: int, length: int):
        """Read a token range of one request's cache at one layer:
        (k, v) with shape [length, H, D]. Quantized caches are returned
        DEQUANTIZED (f32) — raw int8 without the scales would be
        meaningless to a caller."""
        self._check_token_axis_api("get_range")
        slot = self.slot_of(request)
        c = self.cache
        k = c.k[layer_idx, slot, start:start + length]
        v = c.v[layer_idx, slot, start:start + length]
        if c.k_scale is not None:
            ks = c.k_scale[layer_idx, slot, start:start + length]
            vs = c.v_scale[layer_idx, slot, start:start + length]
            k = k.astype(jnp.float32) * ks[..., None]
            v = v.astype(jnp.float32) * vs[..., None]
        return k, v

    def set_range(self, request: KVCacheRequest, layer_idx: int,
                  start: int, k_data, v_data) -> None:
        """Partial write into one request's cache (reference `set`).
        Quantized caches quantize the incoming floats and update the
        per-(token, head) scale rows."""
        self._check_token_axis_api("set_range")
        slot = self.slot_of(request)
        self._cache = _set_range_donated(
            self.cache, jnp.asarray(k_data), jnp.asarray(v_data),
            layer_idx, slot, start)
