"""Self-Forcing CFG pipeline: 50-step multistep sampling with dual KV caches.

Parity with the reference `CausalDiffusionInferencePipeline`
(`inferix/pipeline/self_forcing/CausalDiffusionInferencePipeline.py:10-385`):
per block, a full multistep sampler (FlowDPMSolver/UniPC) runs with
classifier-free guidance — flow = uncond + g*(cond - uncond) — where the
conditional and unconditional passes each maintain their OWN KV cache
(positive + negative prompt caches); after the block, a t=0 re-run writes
clean context into both caches.

TPU redesign: the cond/uncond pair is ONE batched forward — caches are a
single KVCache with batch 2B (slots [0:B]=positive, [B:2B]=negative), so CFG
costs one model call per step and both caches update in the same jitted step.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EngineConfig
from ..kvcache.cache import CrossAttnCache, KVCache, KVCacheSpec, init_kv_cache
from ..models.schedulers.fm_solvers import (
    FlowDPMSolverMultistep,
    FlowUniPCMultistep,
)
from ..models.wan.causal_dit import (
    Params,
    dit_forward_inference,
    init_params,
    make_statics,
)
from ..ops.flash_attention import DEFAULT_KV_BLOCK
from ..ops.rope import build_rope_tables
from ..profiling.profiler import InferixProfiler
from .base import AbstractInferencePipeline


class CausalDiffusionPipeline(AbstractInferencePipeline):
    """CFG variant of the semi-AR loop (few-step DMD -> many-step CFG)."""

    def __init__(self, config: Optional[EngineConfig] = None,
                 params: Optional[Params] = None,
                 num_sampling_steps: int = 50,
                 sample_solver: str = "unipc",
                 text_encoder=None,
                 profiler: Optional[InferixProfiler] = None,
                 dtype=jnp.float32):
        cfg = config or EngineConfig()
        super().__init__(cfg, profiler)
        self._params = params
        self._text_encoder = text_encoder
        self._dtype = dtype
        self.num_sampling_steps = num_sampling_steps
        # reference default is 'unipc'
        # (CausalDiffusionInferencePipeline.py:34,365-374)
        if sample_solver == "unipc":
            self.solver = FlowUniPCMultistep.create(
                num_sampling_steps, shift=cfg.runtime.timestep_shift
            )
        elif sample_solver in ("dpm++", "dpm"):
            self.solver = FlowDPMSolverMultistep.create(
                num_sampling_steps, shift=cfg.runtime.timestep_shift
            )
        else:
            raise ValueError(f"unknown sample_solver {sample_solver!r}")

    def _initialize_pipeline(self) -> None:
        cfg = self.config
        m, r = cfg.model, cfg.runtime
        if self._params is None:
            self._params = init_params(jax.random.key(r.seed), m,
                                       dtype=self._dtype)
        # batch 2B: [0:B] positive stream, [B:2B] negative stream
        self.statics = make_statics(
            m, 2 * r.batch_size, m.num_frame_per_block, r.latent_height,
            r.latent_width, self._dtype,
            kv_head_major=r.kv_head_major,
            kv_alloc_multiple=(DEFAULT_KV_BLOCK if r.kv_alloc_pad else 0),
        )
        self.rope_tables = build_rope_tables(m.head_dim, m.rope_max_seq_len)
        self.frame_seq = self.statics.geo.frame_seq
        self._block_fn = jax.jit(
            functools.partial(
                _cfg_block_impl,
                statics=self.statics,
                solver=self.solver,
                num_steps=self.num_sampling_steps,
            ),
            donate_argnames=("cache",),
        )

    def _encode_prompts_pair(self, prompts: List[str],
                             negative_prompts: Optional[List[str]]):
        """Positive+negative text features -> one batched cross-attn cache.

        Rows [0:B] hold the positive-prompt features, [B:2B] the
        negative-prompt features (reference dual caches,
        `CausalDiffusionInferencePipeline.py` positive+negative prompt
        caches). Without a text encoder (tests, precomputed-embedding mode)
        both halves are zeros — CFG degenerates to a no-op, so warn."""
        from ..models.wan.causal_dit import precompute_crossattn_cache

        m, r = self.config.model, self.config.runtime
        b = r.batch_size
        if self._text_encoder is not None:
            pos = self._text_encoder(prompts)
            neg = self._text_encoder(
                negative_prompts if negative_prompts
                else [""] * len(prompts)
            )
            feats = jnp.concatenate(
                [pos.astype(self._dtype), neg.astype(self._dtype)], axis=0
            )
        else:
            import warnings

            warnings.warn(
                "CausalDiffusionPipeline has no text encoder: prompts are "
                "ignored and CFG is a no-op (cond == uncond). Pass "
                "text_encoder= to enable guidance.",
                stacklevel=3,
            )
            feats = jnp.zeros((2 * b, m.text_len, m.text_dim), self._dtype)
        return jax.jit(
            functools.partial(precompute_crossattn_cache, cfg=m)
        )(self._params, context=feats)

    def run_text_to_video(
        self,
        prompts: List[str],
        negative_prompts: Optional[List[str]] = None,
        num_frames: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: Optional[int] = None,
        **kwargs,
    ) -> jax.Array:
        self.setup()
        r, m = self.config.runtime, self.config.model
        num_frames = num_frames or r.num_frames
        g = guidance_scale if guidance_scale is not None else max(
            r.guidance_scale, 5.0)
        fpb = m.num_frame_per_block
        assert num_frames % fpb == 0
        rng = jax.random.key(seed if seed is not None else r.seed)

        xattn = self._encode_prompts_pair(prompts, negative_prompts)
        cache = init_kv_cache(self.statics.spec)
        rng, nk = jax.random.split(rng)
        noise = jax.random.normal(
            nk, (r.batch_size, num_frames, r.latent_height, r.latent_width,
                 r.latent_channels)).astype(self._dtype)

        outputs = []
        for bi in range(num_frames // fpb):
            x0, cache = self._block_fn(
                self._params, self.rope_tables, cache, xattn,
                noise[:, bi * fpb:(bi + 1) * fpb],
                jnp.int32(bi * fpb * self.frame_seq),
                jnp.float32(g),
            )
            outputs.append(x0)
        return jnp.concatenate(outputs, axis=1)

    def _generate_segment_with_streaming(self, prompt, initial_latent,
                                         stream_callback, segment_index,
                                         block_callback=None):
        return self.run_text_to_video([prompt])


def _cfg_block_impl(
    params: Params,
    rope_tables,
    cache: KVCache,
    xattn: CrossAttnCache,
    noisy: jax.Array,          # [B, f, H, W, C]
    current_start: jax.Array,
    guidance: jax.Array,
    *,
    statics,
    solver,
    num_steps: int,
):
    b, f = noisy.shape[0], noisy.shape[1]
    latents = noisy
    state = solver.init_state((b,) + noisy.shape[1:])

    for i in range(num_steps):
        t = jnp.full((2 * b, f), float(solver.timesteps[i]), jnp.float32)
        pair = jnp.concatenate([latents, latents], axis=0)
        # intermediate sampler steps need not persist their KV (each step
        # rewrites it; the final t=0 re-run below persists clean context)
        flow, cache = dit_forward_inference(
            params, statics, rope_tables, pair, t, xattn, cache,
            current_start, persist_kv=False,
        )
        flow_cond, flow_uncond = flow[:b], flow[b:]
        flow_g = flow_uncond + guidance * (flow_cond - flow_uncond)
        latents, state = solver.step(flow_g, i, latents, state)

    # clean-context rerun into both caches
    t0 = jnp.zeros((2 * b, f), jnp.float32)
    pair = jnp.concatenate([latents, latents], axis=0)
    _, cache = dit_forward_inference(
        params, statics, rope_tables, pair, t0, xattn, cache, current_start
    )
    return latents, cache
