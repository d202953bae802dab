"""Semi-autoregressive block-diffusion denoise loop.

This is the TPU re-design of the reference's canonical inner loop
(`inferix/pipeline/self_forcing/CausalInferencePipeline.py:108-421`):

  per temporal block of `num_frame_per_block` latent frames:
    1. few-step denoise (denoising_step_list, re-noising between steps)
    2. record the final x0 prediction
    3. re-run the generator at t=context_noise so the KV cache holds CLEAN
       context for subsequent blocks (`:348-361`)

A block dispatches as TWO jitted programs: the few-step denoise loop (whose
x0 output becomes host-readable one forward early — lower time-to-first-
block) and the cache-donating context re-run, which pipelines behind the
next block / host-side decode. With `context_mode="last_step"` the second
program is skipped entirely: the final denoise step persists its KV. The
fused single-program variant (`_denoise_block_impl`) remains for
single-dispatch callers (__graft_entry__, bench_scaling). The block loop
itself stays in Python (one compilation, static shapes; the number of
blocks varies across calls without recompiling).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from ..kvcache.cache import CrossAttnCache, KVCache, init_kv_cache
from ..ops.flash_attention import DEFAULT_KV_BLOCK
from ..models.schedulers.flow_match import FlowMatchSchedule, warp_denoising_steps
from ..models.wan.causal_dit import (
    DiTStatics,
    Params,
    build_rope_tables,
    dit_forward_inference,
    make_statics,
    precompute_crossattn_cache,
)


def span_bucket(start_tokens: int, block_tokens: int, max_tokens: int,
                ttfb_only: bool = False) -> int | None:
    """Power-of-two-bucketed static grid bound for the prefix-span kernels.

    Returns the bucketed token bound covering the live prefix after this
    block's write, or None for "use the full-grid program". A bucket that
    reaches max_tokens is always folded to None — max_span == the whole
    cache is the same computation as no bound, and returning None reuses
    the default program instead of compiling an identical twin.

    ttfb_only: bucket only while the bound is <= max_tokens // 2. Early
    blocks (the TTFB-critical dispatches, where most grid steps are dead)
    get trimmed grids; every later block dispatches the SAME program as
    span grids off — measured to keep the -8.3% TTFB win without the
    -1.9% clip-throughput cost of in-clip bucket switching (BASELINE r4
    wan_span_final / r5 span_ttfb)."""
    end = start_tokens + block_tokens
    nblk = -(-end // block_tokens)
    p2 = 1
    while p2 < nblk:
        p2 *= 2
    bound = p2 * block_tokens
    if bound >= max_tokens:
        return None
    if ttfb_only and bound > max_tokens // 2:
        return None
    return bound


class SemiARGenerator:
    """Owns the compiled step functions for one (batch, block, latent) geometry."""

    def __init__(
        self,
        cfg: EngineConfig,
        params: Params,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.cfg = cfg
        self.dtype = dtype
        m, r = cfg.model, cfg.runtime

        # Trace-time globals are applied HERE, from the config — this
        # constructor is the chokepoint for every Wan forward (pipelines,
        # bench, dryrun, batcher) — and UNCONDITIONALLY, so no generator
        # inherits a previous one's setting. The fused Pallas act-quant
        # cannot be GSPMD-auto-partitioned, so multi-device meshes force it
        # off regardless of the config.
        from ..ops.rope import set_rope_impl
        from ..quant.api import set_fused_act_quant

        single_dev = mesh is None or mesh.devices.size == 1
        want_fused = (cfg.quant.enabled and cfg.quant.fused_act_quant)
        if want_fused and not single_dev:
            from ..core.monitoring import print_rank_0

            print_rank_0("[quant] fused act-quant disabled: multi-device "
                         "mesh (Pallas is not GSPMD-shardable)")
        set_fused_act_quant(want_fused and single_dev)
        set_rope_impl("mxu" if cfg.runtime.rope_mxu else "pairs")

        # fuse self-attn q/k/v into one [D, 3D] projection (numerically
        # identical, one MXU dispatch per layer). Kept separate under tp>1:
        # the head-sharded TP layout splits each projection's output axis.
        if m.fuse_qkv and (mesh is None or mesh.shape.get("tp", 1) == 1):
            from ..models.wan.causal_dit import fuse_qkv_params

            params = fuse_qkv_params(params)
        self.params = params

        # in-forward SP attention (reference CoreAttention CP path): active
        # when a mesh with sp>1 is supplied and the parallel config names a
        # mode; otherwise single-device attention + GSPMD handles sharding
        sp_mode = "none"
        if mesh is not None and cfg.parallel.sp_mode in (
                "ulysses", "ring", "ring_pass_q", "ring_pass_kv"):
            if mesh.shape.get("sp", 1) > 1:
                sp_mode = cfg.parallel.sp_mode
            elif mesh.shape.get("tp", 1) > 1 \
                    and cfg.parallel.sp_mode == "ulysses":
                # tp-only meshes still need the island on real TPUs: the
                # Pallas cache kernel cannot be GSPMD-auto-partitioned, so
                # head sharding must happen inside shard_map (the ulysses
                # island already lays heads over the combined (tp, sp) axis;
                # at sp=1 its a2a is an identity)
                sp_mode = "ulysses"
        self.mesh = mesh
        self.sp_mode = sp_mode
        # KV cache storage: int8 (+scales, in-kernel dequant) or scale-free
        # fp8 e4m3 (cast-only) — both halve cache HBM; bf16 is the fastest
        # COMPUTE (measured: int8-KV attention 7.11 ms vs bf16 6.54 at full
        # cache), so quantized caches are capacity features for multi-stream
        # serving.
        quant_kv = cfg.quant.enabled and cfg.quant.quantize_kv_cache
        kv_dtype = None
        quantized_kv = False
        if quant_kv and cfg.quant.kv_cache_dtype == "fp8":
            kv_dtype = jnp.float8_e4m3fn
        elif quant_kv:
            quantized_kv = True
        self.statics = make_statics(
            m, r.batch_size, m.num_frame_per_block, r.latent_height,
            r.latent_width, dtype,
            quantized_kv=quantized_kv,
            kv_head_major=r.kv_head_major,
            kv_alloc_multiple=(DEFAULT_KV_BLOCK if r.kv_alloc_pad else 0),
            # mesh always rides the statics: sp_mode selects the in-forward
            # SP attention islands; a pp>1 mesh (with sp_mode none) routes
            # the layer stack through the GPipe pipeline
            mesh=mesh,
            sp_mode=sp_mode,
            kv_dtype=kv_dtype,
        )
        if (mesh is not None and mesh.shape.get("pp", 1) > 1
                and sp_mode == "none" and r.batch_size == 1):
            from ..core.monitoring import print_rank_0

            print_rank_0(
                "[pp] WARNING: Wan pp with batch_size=1 is a CAPACITY axis "
                "only — one microbatch leaves (pp-1)/pp of every stage "
                "idle (denoise steps, blocks, and in-block tokens are all "
                "sequentially coupled, so there is no other microbatch "
                "source). Use tp/sp for single-stream speed; pp pays off "
                "for Wan only with batch_size>=2 concurrent streams. "
                "(STATUS.md 'What pp buys, per model')")
        if sp_mode != "none":
            from ..core.monitoring import print_rank_0
            from ..parallel.distributed_attention import sp_comm_bytes_per_layer

            geo = self.statics.geo
            per_layer = sp_comm_bytes_per_layer(
                sp_mode, mesh.shape["sp"], mesh.shape.get("tp", 1),
                r.batch_size, geo.tokens, self.statics.spec.max_tokens,
                m.num_heads, m.head_dim,
                itemsize=jnp.dtype(dtype).itemsize,
            )
            print_rank_0(
                f"[sp] mode={sp_mode} sp={mesh.shape['sp']} "
                f"comm/layer/forward={per_layer / 2**20:.2f} MiB, "
                f"per step (x{m.num_layers} layers x"
                f"{len(r.denoising_step_list) + 1} forwards)="
                f"{per_layer * m.num_layers * (len(r.denoising_step_list) + 1) / 2**30:.3f} GiB"
            )
        self.rope_tables = build_rope_tables(m.head_dim, m.rope_max_seq_len)
        self.schedule = FlowMatchSchedule.create(shift=r.timestep_shift)
        if r.warp_denoising_step:
            self.denoising_steps = warp_denoising_steps(
                self.schedule, r.denoising_step_list
            )
        else:
            self.denoising_steps = tuple(float(s) for s in r.denoising_step_list)
        self.context_noise = float(r.context_noise)
        self.frame_seq = self.statics.geo.frame_seq

        # denoise loop and context re-run dispatch as SEPARATE programs:
        # x0 is host-readable after the 4 denoise forwards (one forward
        # earlier -> ~20% lower time-to-first-block) and the context re-run
        # overlaps with host-side streaming/decode of the block. The denoise
        # half must NOT donate the cache — the context step reads it next
        # (and, running persist_kv=False, never mutates it).
        self.context_mode = getattr(r, "context_mode", "rerun")
        if self.context_mode not in ("rerun", "last_step"):
            raise ValueError(
                f"context_mode must be 'rerun' or 'last_step', got "
                f"{self.context_mode!r}")
        # span-sized attention grids: only meaningful on the real TPU
        # backend (the XLA fallback ignores the bound but would recompile
        # per bucket) and only for the local attention path. False | True
        # (all blocks bucketed) | "ttfb" (early blocks only — see
        # RuntimeConfig.span_grid / span_bucket).
        _sg = getattr(r, "span_grid", False)
        self.span_grid = (_sg if sp_mode == "none"
                          and jax.default_backend() == "tpu" else False)
        if self.context_mode == "last_step":
            # 4 forwards/block instead of 5: the final denoise step persists
            # its KV and there is no context re-run (see RuntimeConfig).
            self._steps_persist = jax.jit(
                functools.partial(_denoise_steps_impl, statics=self.statics,
                                  steps=self.denoising_steps,
                                  persist_last_kv=True),
                static_argnames=("max_span",),
                donate_argnames=("cache",),
            )
        self._steps_only = jax.jit(
            functools.partial(_denoise_steps_impl, statics=self.statics,
                              steps=self.denoising_steps),
            static_argnames=("max_span",),
        )
        self._context_step = jax.jit(
            functools.partial(_context_cache_impl, statics=self.statics,
                              context_noise=self.context_noise),
            static_argnames=("max_span",),
            donate_argnames=("cache",),
        )
        self._xattn = jax.jit(
            functools.partial(precompute_crossattn_cache, cfg=m)
        )

    # -- public API ---------------------------------------------------------

    def init_cache(self) -> KVCache:
        cache = init_kv_cache(self.statics.spec)
        mesh = self.mesh
        if mesh is not None and mesh.devices.size > 1:
            # place the cache in the layout the forward holds it in (the
            # SP island's in_specs / the pp stage split) — an unsharded
            # entry buffer would be replicated per chip (full-cache HBM
            # per device) and reshard on first use
            from jax.sharding import NamedSharding

            from ..parallel.mesh import wan_kv_cache_pspec

            spec = self.statics.spec
            cache = jax.device_put(cache, jax.tree.map(
                lambda f: NamedSharding(mesh, wan_kv_cache_pspec(
                    self.sp_mode, spec.head_major,
                    quantized_field=f.ndim == 4)),
                cache))
        return cache

    def encode_text_context(self, context: jax.Array) -> CrossAttnCache:
        """context: [B, text_len, text_dim] text-encoder features."""
        return self._xattn(self.params, context=context)

    def denoise_block(
        self,
        cache: KVCache,
        xattn: CrossAttnCache,
        noisy: jax.Array,        # [B, f, H, W, C]
        rng: jax.Array,
        current_start_frame: int | jax.Array,
    ) -> Tuple[jax.Array, KVCache]:
        start = jnp.asarray(current_start_frame, jnp.int32) * self.frame_seq
        span = self._span_bound(current_start_frame, noisy.shape[1])
        if self.context_mode == "last_step":
            return self._steps_persist(
                self.params, self.rope_tables, self.schedule, cache, xattn,
                noisy, rng, start, max_span=span,
            )
        x0 = self._steps_only(
            self.params, self.rope_tables, self.schedule, cache, xattn,
            noisy, rng, start, max_span=span,
        )
        cache = self._context_step(
            self.params, self.rope_tables, cache, xattn, x0, start,
            max_span=span,
        )
        return x0, cache

    def _span_bound(self, current_start_frame, frames: int) -> int | None:
        """Power-of-two-bucketed static bound (tokens) on the live cache
        prefix after this block's write, or None when span grids are off /
        the start is traced (continuous batching passes per-stream [B]
        starts). Buckets in block counts so a 21-frame clip costs
        ~log2(7)=3 extra compiles, not 7."""
        if not self.span_grid or not isinstance(
                current_start_frame, (int, np.integer)):
            return None
        return span_bucket(
            int(current_start_frame) * self.frame_seq,
            frames * self.frame_seq,
            self.statics.spec.max_tokens,
            ttfb_only=self.span_grid == "ttfb",
        )

    def cache_context_block(
        self,
        cache: KVCache,
        xattn: CrossAttnCache,
        clean: jax.Array,
        current_start_frame: int | jax.Array,
    ) -> KVCache:
        """Write a block of clean (already-generated or reference) latents into
        the KV cache without denoising — used for initial_latent prefixes
        (reference `CausalInferencePipeline.py:211-248`)."""
        start = jnp.asarray(current_start_frame, jnp.int32) * self.frame_seq
        return self._context_step(
            self.params, self.rope_tables, cache, xattn, clean, start,
            max_span=self._span_bound(current_start_frame, clean.shape[1]),
        )

    def generate(
        self,
        noise: jax.Array,        # [B, F, H, W, C]
        xattn: CrossAttnCache,
        rng: jax.Array,
        initial_latent: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        block_callback: Optional[Callable] = None,
    ) -> Tuple[jax.Array, KVCache]:
        """Full clip generation. Returns (latents [B, F(+F_init), H, W, C], cache)."""
        fpb = self.cfg.model.num_frame_per_block
        b, num_frames = noise.shape[0], noise.shape[1]
        assert num_frames % fpb == 0, (
            f"num_frames {num_frames} must be divisible by block size {fpb}"
        )
        num_blocks = num_frames // fpb
        if cache is None:
            cache = self.init_cache()

        outputs = []
        start_frame = 0
        if initial_latent is not None:
            ninit = initial_latent.shape[1]
            assert ninit % fpb == 0
            for i in range(ninit // fpb):
                blk = initial_latent[:, i * fpb:(i + 1) * fpb]
                cache = self.cache_context_block(cache, xattn, blk, start_frame)
                start_frame += fpb
            outputs.append(initial_latent)

        spec = self.statics.spec
        if not spec.ring:
            total = (start_frame + num_frames) * self.frame_seq
            assert total <= spec.max_tokens, (
                f"clip needs {total} cache tokens but the global window holds "
                f"{spec.max_tokens}; raise max_attention_frames or enable the "
                f"rolling window (local_attn_size)"
            )
        for bi in range(num_blocks):
            rng, step_rng = jax.random.split(rng)
            noisy = noise[:, bi * fpb:(bi + 1) * fpb]
            x0, cache = self.denoise_block(
                cache, xattn, noisy, step_rng, start_frame
            )
            outputs.append(x0)
            start_frame += fpb
            if block_callback is not None:
                # a callback returning False aborts generation at this block
                # boundary (interactive NEXT_BLOCK stop responsiveness)
                if block_callback(x0, bi) is False:
                    break

        return jnp.concatenate(outputs, axis=1), cache


# ---------------------------------------------------------------------------
# jitted implementations
# ---------------------------------------------------------------------------

def _denoise_steps_impl(
    params: Params,
    rope_tables,
    schedule: FlowMatchSchedule,
    cache: KVCache,
    xattn: CrossAttnCache,
    noisy: jax.Array,
    rng: jax.Array,
    current_start: jax.Array,
    *,
    statics: DiTStatics,
    steps: Sequence[float],
    persist_last_kv: bool = False,
    max_span: Optional[int] = None,
):
    """The few-step denoise loop ONLY (no context re-run): returns x0 and
    leaves the cache untouched (denoise steps run persist_kv=False — each
    step's KV is overwritten anyway). Split from the context re-run so the
    caller can read x0 one forward earlier (lower time-to-first-block) and
    overlap the re-run with host-side streaming/decode.

    persist_last_kv=True (context_mode='last_step'): the FINAL denoise step
    runs unrolled with persist_kv=True and (x0, cache) is returned — the
    block's context KV comes from the last denoise forward (input renoised
    at steps[-1]) instead of a separate clean re-run, saving one full
    forward per block. The scanned prefix steps are unchanged, so the
    default path's compiled graph is identical to persist_last_kv=False."""
    b, f = noisy.shape[0], noisy.shape[1]
    n_steps = len(steps)
    n_scan = n_steps - 1 if persist_last_kv else n_steps

    # scan over denoise steps: ONE compiled forward instance instead of
    # n_steps unrolled copies (the graph is dominated by the 30-layer DiT;
    # unrolling multiplied compile time ~5x).
    t_vals = jnp.asarray(steps, jnp.float32)                       # [n]
    t_nexts = jnp.asarray(list(steps[1:]) + [0.0], jnp.float32)    # [n]
    is_last = jnp.arange(n_steps) == n_steps - 1
    # rng: one key (whole batch shares draws) or [B] keys — continuous
    # batching needs PER-STREAM noise so a stream's trajectory does not
    # depend on which batch slot it occupies.
    per_slot = rng.ndim == 1
    if per_slot:
        step_rngs = jax.vmap(lambda k_: jax.random.split(k_, n_steps),
                             out_axes=1)(rng)   # [n_steps, B]
    else:
        step_rngs = jax.random.split(rng, n_steps)

    def step(carry, xs):
        # the cache is deliberately NOT a carry: persist_kv=False never
        # mutates it, and a pass-through carry blocks the donation aliasing
        # of the final persisting forward (XLA materializes a full extra
        # cache copy — see dit_forward_inference)
        noisy_c, x0_c = carry
        t_val, t_next, last, srng = xs
        t = jnp.full((b, f), t_val, jnp.float32)
        # persist_kv=False: each denoise step's KV is overwritten by the next
        # step (and finally by the clean context re-run), so the per-layer
        # write-back into the cache is pure wasted HBM traffic
        flow, _ = dit_forward_inference(
            params, statics, rope_tables, noisy_c, t, xattn, cache,
            current_start, persist_kv=False, max_span=max_span,
        )
        x0 = schedule.flow_to_x0(flow, noisy_c, t)
        if per_slot:
            fresh = jax.vmap(
                lambda kk: jax.random.normal(kk, x0.shape[1:], jnp.float32)
            )(srng).astype(x0.dtype)
        else:
            fresh = jax.random.normal(srng, x0.shape, jnp.float32).astype(x0.dtype)
        t_next_b = jnp.full((b, f), t_next, jnp.float32)
        renoised = schedule.add_noise(x0, fresh, t_next_b)
        noisy_next = jnp.where(last, x0, renoised)
        return (noisy_next, x0), None

    if not persist_last_kv:
        (_, x0), _ = jax.lax.scan(
            step, (noisy, noisy), (t_vals, t_nexts, is_last, step_rngs)
        )
        return x0

    # context_mode='last_step': scan the first n-1 steps (same rng stream as
    # the default path, so x0 is bit-identical), then unroll the final step
    # with persist_kv=True — its KV write IS the block's context.
    if n_scan > 0:
        (noisy_c, _), _ = jax.lax.scan(
            step, (noisy, noisy),
            (t_vals[:n_scan], t_nexts[:n_scan], is_last[:n_scan],
             step_rngs[:n_scan]),
        )
    else:
        noisy_c = noisy
    t = jnp.full((b, f), float(steps[-1]), jnp.float32)
    flow, cache = dit_forward_inference(
        params, statics, rope_tables, noisy_c, t, xattn, cache,
        current_start, persist_kv=True, max_span=max_span,
    )
    x0 = schedule.flow_to_x0(flow, noisy_c, t)
    return x0, cache


def _denoise_block_impl(
    params: Params,
    rope_tables,
    schedule: FlowMatchSchedule,
    cache: KVCache,
    xattn: CrossAttnCache,
    noisy: jax.Array,
    rng: jax.Array,
    current_start: jax.Array,
    *,
    statics: DiTStatics,
    steps: Sequence[float],
    context_noise: float,
) -> Tuple[jax.Array, KVCache]:
    """Full block step in one program: denoise loop + clean-context re-run
    (the flow output of the re-run is discarded, so the head is skipped).
    `SemiARGenerator.denoise_block` dispatches the two halves as separate
    programs instead (earlier x0 readback); this fused variant remains for
    single-dispatch callers (__graft_entry__, bench_scaling)."""
    b, f = noisy.shape[0], noisy.shape[1]
    x0 = _denoise_steps_impl(
        params, rope_tables, schedule, cache, xattn, noisy, rng,
        current_start, statics=statics, steps=steps,
    )
    t_ctx = jnp.full((b, f), context_noise, jnp.float32)
    _, cache = dit_forward_inference(
        params, statics, rope_tables, x0, t_ctx, xattn, cache, current_start,
        need_output=False,
    )
    return x0, cache


def _context_cache_impl(
    params: Params,
    rope_tables,
    cache: KVCache,
    xattn: CrossAttnCache,
    clean: jax.Array,
    current_start: jax.Array,
    *,
    statics: DiTStatics,
    context_noise: float,
    max_span: Optional[int] = None,
) -> KVCache:
    b, f = clean.shape[0], clean.shape[1]
    t = jnp.full((b, f), context_noise, jnp.float32)
    _, cache = dit_forward_inference(
        params, statics, rope_tables, clean, t, xattn, cache, current_start,
        need_output=False, max_span=max_span,
    )
    return cache
