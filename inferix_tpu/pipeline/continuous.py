"""Continuous batching of concurrent world-simulation streams.

BASELINE.json config #5: multiple independent generation streams share one
batched denoise step. Each stream occupies a KV-cache batch slot
(`kvcache/manager.py`) and advances at ITS OWN block position — the jitted
step takes per-slot `current_start` vectors (per-batch rope offsets, cache
writes and attention prefix lengths), so admitting or retiring a stream never
recompiles anything: a new stream just resets its slot and starts at
position 0 while its neighbors continue mid-clip.

The reference's closest primitive is the per-request KVCacheRequest list
(`pipeline/self_forcing/pipeline.py:386-391`), which still advances all
requests in lockstep; this scheduler removes that restriction.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from ..kvcache.cache import CrossAttnCache, KVCache
from ..kvcache.manager import KVCacheManager, KVCacheRequest
from .semi_ar import SemiARGenerator


@dataclasses.dataclass
class Stream:
    """One generation request occupying a batch slot."""

    request_id: str
    slot: int
    num_frames: int
    frames_done: int = 0
    rng: Optional[jax.Array] = None
    outputs: List[jax.Array] = dataclasses.field(default_factory=list)

    @property
    def finished(self) -> bool:
        return self.frames_done >= self.num_frames


class ContinuousBatcher:
    """Admits streams into slots and advances all active streams one block
    per step with a single batched denoise call."""

    def __init__(self, generator: SemiARGenerator):
        self.gen = generator
        self.spec = generator.statics.spec
        self.manager = KVCacheManager(self.spec)
        self.max_streams = self.spec.batch
        self.streams: Dict[str, Stream] = {}
        self._xattn: Optional[CrossAttnCache] = None
        self._noise_shape = None
        self.fpb = generator.cfg.model.num_frame_per_block
        self.max_frames = generator.cfg.model.attention_window_frames

    def set_conditioning(self, xattn: CrossAttnCache) -> None:
        """Batched cross-attn cache covering all slots (per-slot prompts are
        rows of the batch)."""
        self._xattn = xattn

    def admit(self, request_id: str, num_frames: int,
              seed: int = 0) -> Stream:
        req = KVCacheRequest(request_id)
        slot = self.manager.allocate_slots(req)
        stream = Stream(request_id=request_id, slot=slot,
                        num_frames=num_frames, rng=jax.random.key(seed))
        self.streams[request_id] = stream
        return stream

    def retire(self, request_id: str) -> Stream:
        stream = self.streams.pop(request_id)
        self.manager.free(KVCacheRequest(request_id))
        return stream

    @property
    def active(self) -> List[Stream]:
        return [s for s in self.streams.values() if not s.finished]

    def step(self) -> List[Tuple[str, jax.Array]]:
        """Advance every active stream one block. Returns the (request_id,
        block_latents) pairs produced this step."""
        active = self.active
        if not active or self._xattn is None:
            return []
        r = self.gen.cfg.runtime
        b = self.max_streams

        starts = np.zeros(b, np.int32)
        for s in active:
            starts[s.slot] = s.frames_done
        start_frames = jnp.asarray(starts)

        noise = jnp.zeros(
            (b, self.fpb, r.latent_height, r.latent_width, r.latent_channels),
            self.gen.dtype,
        )
        slot_keys = [jax.random.key(0)] * b  # inert keys for idle slots
        for s in active:
            s.rng, sub, inner = jax.random.split(s.rng, 3)
            blk = jax.random.normal(
                sub, (self.fpb, r.latent_height, r.latent_width,
                      r.latent_channels)).astype(self.gen.dtype)
            noise = noise.at[s.slot].set(blk)
            slot_keys[s.slot] = inner

        x0, cache = self.gen.denoise_block(
            self.manager.cache, self._xattn, noise,
            jnp.stack(slot_keys), start_frames,
        )
        self.manager.update(cache)

        out = []
        for s in active:
            block = x0[s.slot:s.slot + 1]
            s.outputs.append(block)
            s.frames_done += self.fpb
            out.append((s.request_id, block))
        return out
