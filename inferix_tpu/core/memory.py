"""Component-level device<->host memory manager.

Parity with the reference `AsyncMemoryManager`
(`inferix/core/memory/manager.py:55-497`): registered components (parameter
pytrees — generator, text encoder, VAE) swap between device HBM and host
memory under a byte budget with LRU eviction, `use()` / `exclusive()`
contexts, and prefetch. The reference uses CUDA streams and
`DynamicSwapInstaller` __getattr__ patching; in JAX the analogue is simply
moving pytrees with jax.device_put (pinned host memory kind when available)
— transfers are async by nature and overlap with compute until the arrays
are consumed.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import jax


def _tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def _to_host(tree):
    dev = jax.devices()[0]
    try:
        sharding = jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        )
        return jax.device_put(tree, sharding)
    except Exception:
        return jax.device_get(tree)


def _to_device(tree):
    dev = jax.devices()[0]
    try:
        sharding = jax.sharding.SingleDeviceSharding(dev, memory_kind="device")
        return jax.device_put(tree, sharding)
    except Exception:
        return jax.device_put(tree, dev)


class ManagedComponent:
    def __init__(self, name: str, tree: Any, on_update: Optional[Callable] = None):
        self.name = name
        self.tree = tree
        self.on_device = True
        self.last_used = time.monotonic()
        self.nbytes = _tree_bytes(tree)
        # callback receiving the (possibly moved) tree so owners can rebind
        self.on_update = on_update


class AsyncMemoryManager:
    """Budget-driven component swapper."""

    def __init__(self, budget_bytes: Optional[int] = None):
        self.budget_bytes = budget_bytes
        self._components: Dict[str, ManagedComponent] = {}
        self._lock = threading.Lock()

    # -- registration -------------------------------------------------------

    def register(self, name: str, tree: Any,
                 on_update: Optional[Callable] = None) -> None:
        with self._lock:
            self._components[name] = ManagedComponent(name, tree, on_update)

    def get(self, name: str) -> Any:
        return self._components[name].tree

    def device_bytes(self) -> int:
        return sum(c.nbytes for c in self._components.values() if c.on_device)

    # -- movement -----------------------------------------------------------

    def _move(self, comp: ManagedComponent, to_device: bool) -> None:
        if comp.on_device == to_device:
            return
        comp.tree = _to_device(comp.tree) if to_device else _to_host(comp.tree)
        comp.on_device = to_device
        if comp.on_update is not None:
            comp.on_update(comp.tree)

    def offload(self, name: str) -> None:
        with self._lock:
            self._move(self._components[name], to_device=False)

    def prefetch(self, name: str) -> None:
        """Start moving a component to device (async under the hood)."""
        with self._lock:
            comp = self._components[name]
            # a resident component brings ZERO new bytes — counting its
            # nbytes again on top of device_bytes() (which already includes
            # them) evicted every other component on each use() of a
            # resident one. Budget enforcement still runs (registration can
            # leave the pool over budget).
            incoming = 0 if comp.on_device else comp.nbytes
            self._ensure_budget(incoming, exclude=name)
            self._move(comp, to_device=True)

    def _ensure_budget(self, incoming: int, exclude: str) -> None:
        if self.budget_bytes is None:
            return
        # LRU-evict others until incoming fits
        resident = [c for c in self._components.values()
                    if c.on_device and c.name != exclude]
        resident.sort(key=lambda c: c.last_used)
        while resident and self.device_bytes() + incoming > self.budget_bytes:
            self._move(resident.pop(0), to_device=False)

    # -- contexts -----------------------------------------------------------

    @contextlib.contextmanager
    def use(self, name: str):
        """Ensure a component is on device for the duration."""
        self.prefetch(name)
        comp = self._components[name]
        comp.last_used = time.monotonic()
        yield comp.tree

    @contextlib.contextmanager
    def exclusive(self, name: str):
        """Offload every OTHER component, run, then leave them on host (the
        reference's VAE-decode choreography: offload generator + text encoder
        around the decode, `pipeline/self_forcing/pipeline.py:701-796`)."""
        with self._lock:
            for other in self._components.values():
                if other.name != name:
                    self._move(other, to_device=False)
            self._move(self._components[name], to_device=True)
        comp = self._components[name]
        comp.last_used = time.monotonic()
        yield comp.tree


def stream_layer_forward(blocks_host: Any, layer_fn: Callable, carry: Any,
                         prefetch: int = 2) -> Any:
    """Run a layer stack whose stacked parameters live in HOST memory,
    streaming one layer at a time to the device with the next transfer
    overlapping the current layer's compute.

    This is the TPU analog of the reference's `DynamicSwapInstaller`
    (`inferix/core/memory/utils.py:15-140`, which patches nn.Module
    attribute access to page weights per-module): run a model LARGER than
    free HBM at the cost of one host->device copy per layer. JAX's async
    dispatch provides the overlap — `jax.device_put` of layer i+1 is
    issued before layer i's compute is awaited, so at most `prefetch`
    layer buffers are resident.

    blocks_host: pytree whose leaves are np.ndarrays (or host-committed
    jax arrays) stacked on axis 0 — leaf[i] is layer i's parameter.
    layer_fn(carry, block) -> carry; jit it ONCE outside (every layer has
    the same shapes, so the loop reuses a single compile).
    """
    import numpy as np

    leaves = jax.tree.leaves(blocks_host)
    if not leaves:
        return carry
    n = leaves[0].shape[0]
    host = jax.tree.map(np.asarray, blocks_host)   # zero-copy for numpy

    def fetch(i):
        return jax.tree.map(lambda a: jax.device_put(a[i]), host)

    bufs = {i: fetch(i) for i in range(min(prefetch, n))}
    for i in range(n):
        nxt = i + len(bufs)
        carry = layer_fn(carry, bufs.pop(i))
        if nxt < n:
            # issued AFTER dispatching layer i (async) — the copy rides
            # under layer i..i+prefetch-1 compute
            bufs[nxt] = fetch(nxt)
    return carry
