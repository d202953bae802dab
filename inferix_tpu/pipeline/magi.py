"""MAGI-1 pipeline: chunk-windowed AR-diffusion generation.

Parity with the reference `MagiPipeline` + `SampleTransport.walk`
(`inferix/pipeline/magi/pipeline.py:32-114`, `video_generate.py:253-769`):
T2V/I2V/V2V via prefix chunks, the windowed denoise loop that yields clean
chunks as they finish (enabling per-chunk VAE decode downstream), the
fwd_extra_1st_chunk clean re-forward that persists a finished chunk's KV, CFG
dispatch (3-forward cond_pre+text / cond_pre / uncond with per-t-range scales,
`dit_model.py:399-536`, or distilled single forward), and kv-range policies.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Generator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kvcache.cache import KVCache, init_kv_cache
from ..models.magi.dit import (
    MagiModelConfig,
    MagiStatics,
    Params,
    init_magi_params,
    magi_forward,
    magi_forward_uncond,
    make_magi_statics,
    sync_cache_rows,
)
from ..models.magi.scheduler import ChunkSchedule, MagiScheduleConfig
from ..ops.flash_attention import DEFAULT_KV_BLOCK
from ..ops.rope import build_rope_tables
from ..profiling.profiler import InferixProfiler


@dataclasses.dataclass
class MagiRuntimeConfig:
    """Runtime knobs (reference 4.5B json `runtime_config`)."""

    cfg_number: int = 1                     # 1 = distilled, 3 = full CFG
    cfg_t_range: Sequence[float] = (0.0, 0.0217, 0.1, 0.3, 0.999)
    prev_chunk_scales: Sequence[float] = (1.5, 1.5, 1.5, 1.0, 1.0)
    text_scales: Sequence[float] = (7.5, 7.5, 7.5, 0.0, 0.0)
    num_steps: int = 8
    window_size: int = 4
    chunk_width: int = 6
    noise2clean_kvrange: Sequence[int] = ()
    clean_chunk_kvrange: int = -1
    clean_t: float = 0.9999
    seed: int = 1234
    t_schedule: str = "sd3"
    t_shift: float = 3.0
    # distilled checkpoints (reference engine_config.distill +
    # shortcut_mode, 4.5B_distill_config.json): the condition vector gains
    # a distill-dt embedding, and when the oldest denoising chunk is
    # nearly clean (t > threshold) its velocity is re-mixed with a
    # prefix-free re-forward of the same chunk
    # (forward_dispatcher distill_nearly_clean_chunk, dit_model.py:543-576)
    distill: bool = False
    shortcut_mode: str = ""
    distill_nearly_clean_chunk_threshold: float = 0.3
    distill_prev_chunks_scale: float = 0.7  # reference env prev_chunks_scale
    # in-forward CP over the window when a mesh with sp>1 is supplied
    # (reference cp_strategy none/ulysses/cso, dit_module.py:1087-1195;
    # here "cso" = per-chunk shuffled-Ulysses island, the TPU CSO analog)
    cp_strategy: str = "none"
    # int8 + per-(token,head)-scale window cache: half the HBM of bf16 at
    # the bf16 kernel's attention rate (the fp8 e4m3 cache runs at half
    # rate on v5e — BASELINE.md). The 4.5B serving config on one chip.
    quantize_kv: bool = False
    # span-sized attention grids: pass the walk's host-known per-chunk
    # kv-span widths as static args so each chunk's Pallas kernel steps
    # only over its span instead of the whole padded cache (early chunks
    # attend 1-2 of ~9 cached chunks — the dead grid steps are the
    # exp/r5_span_grid.py suspect). Distinct span tuples recompile: with
    # noise2clean kvrange caps the set is bounded (~2x window cycling
    # variants, exact widths); without caps widths are pow2-bucketed so
    # long walks stay at O(log) tuples. All compiles are persistently
    # cached. Disable to pin one compile per window shape.
    span_grid: bool = True
    # head-major window cache [L, B, H, S, D] (KVCacheSpec.head_major): the
    # span kernels' [B*H, S, D] fold becomes a free reshape instead of a
    # full-cache transpose copy per layer per forward. Composes with the
    # CSO/ulysses islands (cache pspecs move with the head axis). Default
    # OFF until the exp/r7_cache_layout.py A/B lands on hardware.
    kv_head_major: bool = False
    # Pad-free window-cache allocation (KVCacheSpec.alloc_tokens): round the
    # physical slot count up to the flash kernel's kv_block so its per-layer
    # K/V pads become no-ops (the 4.5B window, 4 x 12150 = 48600 tokens,
    # pads to 49152 inside the kernel every layer otherwise). Spans address
    # logical tokens and the pad rows are never attended — bit-equal.
    # Default OFF until the e2e A/B lands on hardware.
    kv_alloc_pad: bool = False
    # Fused one-pass activation quantization for the int8 linears (the
    # Pallas kernel of ops/act_quant.py; quant.api.set_fused_act_quant) —
    # incl. folding the mlp gelu/SwiGLU into fc2's quant pass. Same flip
    # protocol as the Wan flag (QuantConfig.fused_act_quant): default OFF
    # until the hardware A/B.
    fused_act_quant: bool = False
    # Window dispatch granularity. "per_chunk" (default [r4]) dispatches
    # the window as chunk_count sequential single-chunk forwards chained
    # through the cache — the SAME math (chunk i's kv_range covers only
    # chunks <= i, whose KV the earlier dispatches already wrote;
    # equality-tested), at ~1/window the activation live set. MEASURED 4x
    # FASTER than the whole-window program at the 4.5B serving shape on
    # one v5e: 6.99 vs 27.5-28.2 s/forward fresh-process warm-cache
    # (exp/r6_results/magi45b_pc_final.log vs magi45b_{span,nospan,hm}_
    # final.log) — the 48600-token whole-window program thrashes HBM
    # (XLA spills at that live set), and it also beats the round-2
    # 8.42 s record. It is additionally the 24B memory lever (the
    # whole-window tp4 x sp2 x pp2 AOT came back 9.86 GiB of temp,
    # fits=false) and the only cfg_number=3 configuration the remote
    # compile helper can build at 4.5B. "whole" remains available for
    # A/Bs; with n_chunks==1 the two are identical. "scan" fuses the
    # per-chunk loop into ONE program (lax.scan over chunks, cache as
    # carry): the same one-chunk live set — XLA sizes scan temps at the
    # MAX over iterations — minus the per-chunk fixed overhead the L4
    # control measured (~0.36 s/forward: dispatch boundaries + host loop),
    # at the cost of a uniform (max) span grid across the window's chunks.
    window_dispatch: str = "per_chunk"


class MagiPipeline:
    def __init__(
        self,
        model_cfg: MagiModelConfig = MagiModelConfig(),
        runtime: MagiRuntimeConfig = MagiRuntimeConfig(),
        params: Optional[Params] = None,
        latent_h: int = 32,
        latent_w: int = 32,
        max_chunks: int = 16,
        dtype=jnp.float32,
        profiler: Optional[InferixProfiler] = None,
        mesh=None,
        kv_dtype=None,
        quantize_kv: bool = False,
    ):
        self.cfg = model_cfg
        self.rt = runtime
        self.dtype = dtype
        self.profiler = profiler or InferixProfiler()
        from ..quant.api import set_fused_act_quant

        # set UNCONDITIONALLY (no stale inheritance from a previous
        # pipeline in this process). The fused Pallas quant cannot be
        # GSPMD-auto-partitioned: only single-device MAGI serving takes it
        # (multi-chip keeps the XLA chain — the int8 linears there are
        # tp-sharded GSPMD matmuls).
        set_fused_act_quant(runtime.fused_act_quant
                            and (mesh is None or mesh.devices.size == 1))
        # batch 2 = (conditional, unconditional) halves, reference x.chunk(2).
        # The distilled path (cfg_number == 1) runs a SINGLE conditional
        # forward like the reference dispatcher (dit_model.py:537-596) —
        # except under pp, where the two halves double as the pipeline's
        # microbatches.
        pp_on = mesh is not None and mesh.shape.get("pp", 1) > 1
        self.batch = 2 if (runtime.cfg_number >= 2 or pp_on) else 1
        sp_mode = "none"
        if (mesh is not None
                and (mesh.shape.get("sp", 1) > 1
                     or mesh.shape.get("tp", 1) > 1)):
            # composes with pp>1 too: magi_forward_pp runs the pipeline
            # partially manual (pp only) with the stage matmuls GSPMD
            # tensor-sharded and the attention in nested (tp, sp) islands
            # — the 24B tp4 x pp2 / tp2 x sp2 x pp2 deployments
            # composes with tp>1: heads shard over the combined (tp, sp)
            # axis inside the island, linears shard over tp via GSPMD
            # (magi_param_pspecs) — the 24B tp=4 x sp=2 serving layout
            sp_mode = runtime.cp_strategy
            if sp_mode not in ("cso", "ulysses"):
                # head-sharded projections REQUIRE the shard_map islands
                # (Pallas kernels can't be GSPMD-auto-partitioned — same
                # constraint the Wan generator handles by forcing ulysses
                # on tp-only meshes); default to cso rather than emit a
                # program that only works on the CPU XLA fallback
                from ..core.monitoring import print_rank_0

                print_rank_0(
                    "[magi] tp/sp>1 mesh without cp_strategy: forcing "
                    "cp_strategy='cso' (attention must run inside the "
                    "shard_map islands on TPU)")
                sp_mode = "cso"
        self.statics = make_magi_statics(
            model_cfg, self.batch, latent_h, latent_w, max_chunks, dtype,
            mesh=mesh, sp_mode=sp_mode, kv_dtype=kv_dtype,
            quantize_kv=quantize_kv or runtime.quantize_kv,
            kv_head_major=runtime.kv_head_major,
            kv_alloc_multiple=(DEFAULT_KV_BLOCK if runtime.kv_alloc_pad
                               else 0),
        )
        if self.statics.sp_mode in ("cso", "ulysses"):
            from ..core.monitoring import print_rank_0
            from ..parallel.distributed_attention import sp_comm_bytes_per_layer

            per_layer = sp_comm_bytes_per_layer(
                "cso", max(mesh.shape.get("sp", 1), 1), 1, self.batch,
                runtime.window_size * self.statics.geo.chunk_tokens,
                self.statics.spec.max_tokens,
                model_cfg.num_attention_heads, model_cfg.kv_channels,
                itemsize=jnp.dtype(dtype).itemsize,
            )
            print_rank_0(
                f"[cso] sp={mesh.shape['sp']} comm/layer/forward="
                f"{per_layer / 2**20:.2f} MiB over "
                f"{runtime.window_size} chunks")
        self.rope_tables = build_rope_tables(model_cfg.kv_channels,
                                             model_cfg.rope_max_seq_len)
        self.params = params if params is not None else init_magi_params(
            jax.random.key(runtime.seed), model_cfg, dtype
        )
        # apply GSPMD shardings when a >1-device mesh is supplied: tensor
        # layout over tp (magi_param_pspecs), window-cache kv heads over the
        # combined (tp, sp) axis matching the CSO island
        self._cache_sharding = None
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding

            from ..parallel.mesh import (
                magi_kv_cache_pspec,
                magi_param_pspecs,
                to_named,
            )

            pp_on2 = mesh.shape.get("pp", 1) > 1
            if model_cfg.gated_linear_unit and mesh.shape.get("tp", 1) > 1:
                # gate/up-separate fc1 layout: shard-local silu*mul under
                # tp (see models/magi/dit.py split_gated_fc1)
                from ..models.magi.dit import split_gated_fc1

                self.params = split_gated_fc1(self.params,
                                              model_cfg.ffn_hidden_size)
            # magi_param_pspecs already carries the composed layout:
            # stacked blocks lead with 'pp', big linears shard over 'tp'
            self.params = jax.device_put(
                self.params, to_named(magi_param_pspecs(self.params), mesh))
            self._cache_sharding = lambda quant_field: NamedSharding(
                mesh, magi_kv_cache_pspec(
                    quant_field, head_major=self.statics.spec.head_major,
                    pp=pp_on2))
        # pp>1: run the layer stack through the microbatched GPipe pipeline
        # (cond/uncond halves stream through the stages — the reference's
        # work-queue PP overlap, video_generate.py:723-756)
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("pp", 1) > 1:
            from ..models.magi.dit import magi_forward_pp

            fwd_impl = functools.partial(magi_forward_pp, mesh=mesh)
        else:
            fwd_impl = magi_forward
        # cfg>=2: the batched (cond_pre_and_text row 0 / cond_pre row 1)
        # forward persists ONLY row 1's KV — sync_cache_rows reproduces the
        # reference's update_kv_cache False/True split (dit_model.py:412-434)
        self._fwd = jax.jit(
            functools.partial(fwd_impl, statics=self.statics,
                              rope_tables=self.rope_tables,
                              sync_kv_rows=runtime.cfg_number >= 2),
            static_argnames=("static_kv_spans",),
            donate_argnames=("cache",),
        )
        # per-chunk window dispatch: the row-sync must happen ONCE after the
        # whole window (inside the chunk loop, later chunks' cond+text row
        # must still attend earlier chunks' OWN row-0 KV, as in the batched
        # whole-window forward) — so the loop uses a sync-free forward and
        # the window span is synced afterwards
        self._fwd_nosync = jax.jit(
            functools.partial(fwd_impl, statics=self.statics,
                              rope_tables=self.rope_tables,
                              sync_kv_rows=False),
            static_argnames=("static_kv_spans",),
            donate_argnames=("cache",),
        )
        # "scan" window dispatch: the whole per-chunk loop as one program
        from ..models.magi.dit import magi_forward_window_scan

        self._fwd_scan = jax.jit(
            functools.partial(magi_forward_window_scan, statics=self.statics,
                              rope_tables=self.rope_tables),
            static_argnames=("static_kv_spans",),
            donate_argnames=("cache",),
        )
        self._sync_window = jax.jit(
            functools.partial(sync_cache_rows, self.statics.spec),
            static_argnames=("length",),
            donate_argnames=("cache",),
        )

        def _uncond_combine(params, x_den, t_den, caps, masks,
                            v_text, v_pre, prev_s, text_s,
                            distill_dt_factor=None):
            """3rd CFG forward (prefix-free per-chunk uncond) + the 3-term
            per-chunk combination (dit_model.py:495-536). The distill-dt
            embedding (when configured) applies to EVERY forward in the
            reference's get_embedding_and_meta, the uncond included."""
            v_unc = magi_forward_uncond(params, self.statics, x_den, t_den,
                                        caps, masks,
                                        distill_dt_factor=distill_dt_factor)
            w_u = (1.0 - prev_s).reshape(-1, 1, 1, 1, 1)
            w_p = (prev_s - text_s).reshape(-1, 1, 1, 1, 1)
            w_t = text_s.reshape(-1, 1, 1, 1, 1)
            out = (w_u * v_unc.astype(jnp.float32)
                   + w_p * v_pre.astype(jnp.float32)
                   + w_t * v_text.astype(jnp.float32))
            return out.astype(v_unc.dtype)

        self._fwd_uncond_combine = jax.jit(_uncond_combine)

    # -- CFG ----------------------------------------------------------------

    def _cfg_scales(self, t_vals: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-chunk (prev_chunk_scale, text_scale) searchsorted t-buckets
        (reference get_cfg_scale, dit_model.py:495-498)."""
        rng = np.asarray(self.rt.cfg_t_range, np.float64)
        idx = np.searchsorted(rng - 1e-7, np.asarray(t_vals, np.float64)) - 1
        assert idx.min() >= 0 and idx.max() < len(self.rt.prev_chunk_scales)
        prev = np.asarray(self.rt.prev_chunk_scales, np.float32)[idx]
        text = np.asarray(self.rt.text_scales, np.float32)[idx]
        return prev, text

    def _null_caption(self, cap_len: int) -> Tuple[jax.Array, jax.Array]:
        """(null caption [1, cap_len, cap_dim], mask [1, cap_len]) — the
        learned null_caption_embedding table with the reference's 50-token
        uncond mask (video_generate.py:68-81 _process_null_embeddings)."""
        table = self.params["y_embedder"]["null_caption_embedding"]
        assert cap_len <= table.shape[0], (
            f"caption length {cap_len} exceeds null table {table.shape[0]}")
        null = table[None, :cap_len].astype(jnp.float32)
        n_valid = min(50, cap_len)
        mask = jnp.concatenate([
            jnp.ones((1, n_valid), jnp.float32),
            jnp.zeros((1, cap_len - n_valid), jnp.float32)], axis=1)
        return null, mask

    # -- generation ---------------------------------------------------------

    def generate_chunks(
        self,
        caption_emb: jax.Array,    # [1, cap_len, cap_dim]
        caption_mask: jax.Array,   # [1, cap_len]
        chunk_num: int,
        prefix_latents: Optional[jax.Array] = None,  # [1, F0, H, W, C]
        rng: Optional[jax.Array] = None,
        resume_state: Optional[dict] = None,
        state_callback: Optional[callable] = None,
    ) -> Generator[Tuple[int, jax.Array], None, None]:
        """Yields (chunk_index, clean latents [1, chunk_width, H, W, C]) as
        chunks finish denoising — the reference `walk()` generator.

        Mid-walk checkpoint/resume ("persistent world state" — the repo's
        §5 resume subsystem, `utils/state_checkpoint.py`): pass
        `state_callback(state_dict, step)` to snapshot after each forward
        (x / cache / step / per-chunk denoise counts), and `resume_state`
        (such a snapshot) to continue a walk bit-for-bit — the noise draw
        is re-derived from the same rng, and all later math is
        deterministic. The callback must MATERIALIZE what it keeps (e.g.
        np.asarray / save_generation_state): the cache buffers are donated
        into the next forward and a held jax.Array would be invalidated."""
        cfg, rt = self.cfg, self.rt
        geo = self.statics.geo
        cw = rt.chunk_width
        rng = rng if rng is not None else jax.random.key(rt.seed)

        # The TPU GQA cross-attention converts the caption mask to a span
        # via popcount, which is only correct for PREFIX masks (valid
        # tokens then padding — all masks the pipeline produces). Validate
        # here on the host, where the mask is concrete, so a non-prefix
        # user mask fails loudly instead of silently attending the wrong
        # caption tokens on TPU while the CPU path honors it.
        _m = np.asarray(caption_mask) > 0
        if not bool(np.all(_m[:, 1:] <= _m[:, :-1])):
            raise ValueError(
                "caption_mask must be a prefix mask (no interior zeros): "
                "the TPU cross-attention uses its popcount as the span "
                "length")

        chunk_offset = 0
        if prefix_latents is not None:
            assert prefix_latents.shape[1] % cw == 0
            chunk_offset = prefix_latents.shape[1] // cw

        sched = ChunkSchedule(MagiScheduleConfig(
            chunk_num=chunk_num,
            chunk_width=cw,
            window_size=rt.window_size,
            num_steps=rt.num_steps,
            chunk_offset=chunk_offset,
            t_schedule=rt.t_schedule,
            t_shift=rt.t_shift,
            shortcut_mode=rt.shortcut_mode,
            noise2clean_kvrange=rt.noise2clean_kvrange,
            clean_chunk_kvrange=rt.clean_chunk_kvrange,
            clean_t=rt.clean_t,
        ))

        # state: all-chunk latents x, initialized to noise (cond/uncond halves
        # share noise), prefix chunks filled with the prefix
        rng, nkey = jax.random.split(rng)
        x = jax.random.normal(
            nkey, (1, chunk_num * cw, geo.latent_h, geo.latent_w,
                   cfg.latent_channels)
        ).astype(self.dtype)
        # cond/uncond halves share noise (reference x.chunk(2) symmetry)
        x = jnp.broadcast_to(x, (self.batch, *x.shape[1:]))
        if prefix_latents is not None:
            pref = jnp.broadcast_to(
                prefix_latents, (self.batch, *prefix_latents.shape[1:]))
            x = x.at[:, : chunk_offset * cw].set(pref.astype(x.dtype))

        cache = init_kv_cache(self.statics.spec)
        if self._cache_sharding is not None:
            cache = jax.device_put(cache, jax.tree.map(
                lambda f: self._cache_sharding(f.ndim == 4), cache))

        # captions (reference extract_feature_for_inference,
        # video_generate.py:106-117): conditional half = real caption per
        # denoising chunk, uncond half = the learned null_caption_embedding
        # with its 50-token mask; clean chunks get the null caption in BOTH
        # halves (forward_velocity:618-623)
        cap_len = caption_emb.shape[1]
        null_cap, null_mask = self._null_caption(cap_len)

        # prefix feature extraction at clean_t fills the cache — the
        # reference extracts "clean feature without y embedding" using the
        # null half's caption (extract_prefix_video_feature:400-404); the
        # velocity output is discarded, so the 3rd CFG forward is skipped.
        # Skipped entirely on resume: the checkpointed cache already holds
        # the prefix KV and would overwrite these forwards' only output.
        if chunk_offset > 0 and resume_state is None:
            for ci in range(chunk_offset):
                cache = self._forward_window(
                    x[:, ci * cw:(ci + 1) * cw],
                    np.array([rt.clean_t]),
                    caption_emb, caption_mask,
                    cache, slice_point=ci,
                    kv_ranges=np.array([[0, ci + 1]], np.int32),
                    chunk_is_clean=[True],
                    skip_prev_cfg=True,
                    distill_interval=float(sched.interval[0]),
                )[1]

        start_step = 0
        if resume_state is not None:
            x = jnp.asarray(resume_state["x"]).astype(self.dtype)
            cache = KVCache(
                k=jnp.asarray(resume_state["cache"]["k"]),
                v=jnp.asarray(resume_state["cache"]["v"]),
                k_scale=(jnp.asarray(resume_state["cache"]["k_scale"])
                         if "k_scale" in resume_state["cache"] else None),
                v_scale=(jnp.asarray(resume_state["cache"]["v_scale"])
                         if "v_scale" in resume_state["cache"] else None),
            )
            if self._cache_sharding is not None:
                cache = jax.device_put(cache, jax.tree.map(
                    lambda f: self._cache_sharding(f.ndim == 4), cache))
            start_step = int(resume_state["step"])
            sched.chunk_denoise_count[:] = np.asarray(
                resume_state["chunk_denoise_count"])

        chunk_t0 = time.perf_counter()
        for step in range(start_step, sched.total_forward_steps):
            step_t0 = time.perf_counter()
            c_start, c_end, t_s, t_e = sched.window(step)
            extra_clean = sched.fwd_extra_1st_chunk(step)
            w_start = c_start - 1 if extra_clean else c_start
            n_chunks = c_end - w_start

            t_vals = sched.timesteps(step)
            if extra_clean:
                t_vals = np.concatenate([[rt.clean_t], t_vals])
            kv_ranges = sched.kv_ranges(step, include_clean=extra_clean)

            x_window = x[:, w_start * cw: c_end * cw]
            _, denoise_idx = sched.stage_of(step)
            velocity, cache = self._forward_window(
                x_window, t_vals, caption_emb, caption_mask, cache,
                slice_point=w_start, kv_ranges=kv_ranges,
                chunk_is_clean=[extra_clean] + [False] * (n_chunks - 1)
                if extra_clean else [False] * n_chunks,
                distill_interval=float(sched.interval[denoise_idx]),
            )

            # Euler integrate over the denoising chunks only
            if extra_clean:
                velocity = velocity[:, cw:]
            deltas = sched.integrate_deltas(step)
            v = velocity.reshape(velocity.shape[0], c_end - c_start, cw,
                                 *velocity.shape[2:])
            d = jnp.asarray(deltas, v.dtype).reshape(1, -1, 1, 1, 1, 1)
            x_den = x[:, c_start * cw: c_end * cw].reshape(v.shape)
            x_new = (x_den + v * d).reshape(
                x.shape[0], (c_end - c_start) * cw, *x.shape[2:])
            x = x.at[:, c_start * cw: c_end * cw].set(x_new.astype(x.dtype))

            if self.profiler.config.enabled:
                t_vals_np = np.asarray(t_vals)
                self.profiler.record_diffusion_step(
                    step, float(t_vals_np[-1]), c_end - c_start,
                    (time.perf_counter() - step_t0) * 1e3)

            done = sched.mark_integrated(step)
            if done is not None:
                clean = x[:1, done * cw:(done + 1) * cw]
                if self.profiler.config.enabled:
                    # host sync so the block time is real, not dispatch time
                    np.asarray(jax.device_get(clean[(0,) * clean.ndim]))
                    self.profiler.record_block_computation(
                        done - chunk_offset, cw,
                        (time.perf_counter() - chunk_t0) * 1e3)
                    chunk_t0 = time.perf_counter()
                yield done - chunk_offset, clean

            if state_callback is not None:
                # counts are snapshotted AFTER mark_integrated so a resume
                # at step+1 continues with consistent completion accounting
                cache_dict = {k: v for k, v in cache._asdict().items()
                              if v is not None}
                state_callback({
                    "x": x, "cache": cache_dict, "step": step + 1,
                    "chunk_denoise_count": sched.chunk_denoise_count.copy(),
                }, step)

    def _distill_dt_factor(self, distill_interval: Optional[float]
                           ) -> Optional[float]:
        """Reference distill-dt (dit_model.py:175-185)."""
        rt = self.rt
        if not rt.distill:
            return None
        if rt.num_steps == 12:
            assert distill_interval is not None
            return 4.0 / float(distill_interval) * 2.0
        return rt.num_steps / 4.0 * 2.0

    def _forward_window(self, x_window, t_vals, caption_emb, caption_mask,
                        cache, slice_point, kv_ranges,
                        chunk_is_clean: Optional[List[bool]] = None,
                        skip_prev_cfg: bool = False,
                        distill_interval: Optional[float] = None):
        """One (optionally CFG) window forward. Returns (velocity, cache).

        cfg_number == 3 is the reference forward_3cfg + forward_dispatcher
        (`dit_model.py:399-536`): row 0 = cond_pre_and_text, row 1 =
        cond_pre (null caption, adaln dropout token, the row whose KV
        persists), a third prefix-free per-chunk uncond forward, and the
        per-chunk 3-term combination with searchsorted t-bucket scales.
        skip_prev_cfg skips the 3rd forward when only the cache write is
        needed (prefix feature extraction discards the velocity)."""
        rt = self.rt
        geo = self.statics.geo
        cw, ct = geo.chunk_width, geo.chunk_tokens
        n_chunks = len(t_vals)
        if chunk_is_clean is None:
            chunk_is_clean = [False] * n_chunks
        n_clean0 = int(np.sum(chunk_is_clean))
        ddt = self._distill_dt_factor(distill_interval)

        # distilled nearly-clean-chunk trick (reference forward_dispatcher
        # cfg_number==1, dit_model.py:543-576): when the oldest denoising
        # chunk is nearly clean (t > threshold), append a COPY of it as an
        # extra chunk that attends only to itself (prefix-free), and mix:
        # prev_scale * with-prefix + (1-prev_scale) * prefix-free. The extra
        # chunk occupies the NEXT absolute chunk slot (rope + cache span);
        # its cache write is overwritten when that chunk enters a window.
        nearly_clean = False
        if (rt.cfg_number == 1 and rt.distill and not skip_prev_cfg
                and n_chunks > n_clean0):
            t_first = float(np.asarray(t_vals)[n_clean0])
            extra_slot_end = (int(slice_point) + n_chunks + 1) * ct
            fits = extra_slot_end <= self.statics.spec.max_tokens
            nearly_clean = (
                t_first > rt.distill_nearly_clean_chunk_threshold and fits)
        if nearly_clean:
            first = slice(n_clean0 * cw, (n_clean0 + 1) * cw)
            x_window = jnp.concatenate([x_window, x_window[:, first]],
                                       axis=1)
            t_vals = np.concatenate([np.asarray(t_vals, np.float64),
                                     [float(np.asarray(t_vals)[n_clean0])]])
            kv_ranges = np.concatenate(
                [np.asarray(kv_ranges, np.int32),
                 [[int(slice_point) + n_chunks,
                   int(slice_point) + n_chunks + 1]]], axis=0)
            chunk_is_clean = list(chunk_is_clean) + [False]
            n_chunks += 1

        t = jnp.broadcast_to(
            jnp.asarray(t_vals, jnp.float32)[None], (self.batch, n_chunks)
        )
        cap_len = caption_emb.shape[1]
        null_cap, null_mask = self._null_caption(cap_len)

        # per-chunk captions: [B, n_chunks, cap_len, dim]
        cond_caps = jnp.stack(
            [null_cap[0] if clean else caption_emb[0].astype(jnp.float32)
             for clean in chunk_is_clean], axis=0)[None]
        cond_masks = jnp.stack(
            [null_mask[0] if clean else caption_mask[0].astype(jnp.float32)
             for clean in chunk_is_clean], axis=0)[None]
        if self.batch == 2:
            uncond_caps = jnp.broadcast_to(
                null_cap[:, None], (1, n_chunks, *null_cap.shape[1:]))
            uncond_masks = jnp.broadcast_to(
                null_mask[:, None], (1, n_chunks, cap_len))
            caps = jnp.concatenate([cond_caps, uncond_caps], axis=0)
            masks = jnp.concatenate([cond_masks, uncond_masks], axis=0)
            dropout = jnp.asarray([False, True])
        else:
            caps, masks = cond_caps, cond_masks
            dropout = jnp.asarray([False])
        # host-known per-chunk span widths -> span-sized kernel grids.
        # Local Pallas path only: the CSO/ulysses islands do their own
        # sharded dispatch, and off-TPU the XLA fallback ignores spans —
        # passing them would only buy recompiles per distinct tuple.
        # With noise2clean kvrange caps (the serving configs) the raw tuple
        # set is bounded (~2x window cycling variants), so EXACT widths
        # maximize the dead-step saving; WITHOUT caps spans grow with the
        # walk and raw tuples would compile once per position, so they are
        # pow2-bucketed (tests/test_magi.py::
        # test_magi_walk_span_tuples_reach_steady_state).
        kv_ranges = np.asarray(kv_ranges, np.int32)
        spans = None
        if (rt.span_grid and self.statics.sp_mode == "none"
                and jax.default_backend() == "tpu"):
            capped = (len(tuple(rt.noise2clean_kvrange)) > 0
                      or rt.clean_chunk_kvrange >= 0)
            if capped:
                spans = tuple(int(e - s) for s, e in kv_ranges)
            else:
                # one pow2 bucket of the max width for every chunk:
                # distinct tuples stay O(window + log walk), and prefix
                # widths within a window are within 2x of the max anyway
                m = max(1, int((kv_ranges[:, 1] - kv_ranges[:, 0]).max()))
                m = 1 << (m - 1).bit_length() if m > 1 else 1
                spans = (m,) * len(kv_ranges)
        pp_mesh = (self.mesh is not None
                   and self.mesh.shape.get("pp", 1) > 1)
        if rt.window_dispatch == "scan" and n_chunks > 1 and not pp_mesh:
            # one program: lax.scan over chunks, cache as carry (same math
            # and live set as the per-chunk loop, no dispatch boundaries)
            velocity, cache = self._fwd_scan(
                self.params,
                x_window=x_window,
                t=t,
                captions=caps.astype(self.dtype),
                caption_mask=masks,
                cache=cache,
                slice_point=jnp.int32(slice_point),
                kv_ranges=jnp.asarray(kv_ranges, jnp.int32),
                caption_dropout=dropout,
                distill_dt_factor=ddt,
                static_kv_spans=spans,
            )
            if rt.cfg_number >= 2:
                ct_ = self.statics.geo.chunk_tokens
                cache = self._sync_window(
                    cache=cache,
                    start=jnp.int32(slice_point) * ct_,
                    length=n_chunks * ct_,
                )
        elif rt.window_dispatch in ("per_chunk", "scan") and n_chunks > 1:
            # sequential single-chunk dispatches chained through the cache:
            # chunk i's kv_range covers only chunks <= i, whose KV earlier
            # dispatches wrote — identical math at ~1/window the activation
            # live set (the 24B fit lever; see MagiRuntimeConfig)
            vels = []
            for ci in range(n_chunks):
                v_i, cache = self._fwd_nosync(
                    self.params,
                    x_window=x_window[:, ci * cw:(ci + 1) * cw],
                    t=t[:, ci:ci + 1],
                    captions=caps[:, ci:ci + 1].astype(self.dtype),
                    caption_mask=masks[:, ci:ci + 1],
                    cache=cache,
                    slice_point=jnp.int32(slice_point) + ci,
                    kv_ranges=jnp.asarray(kv_ranges[ci:ci + 1], jnp.int32),
                    caption_dropout=dropout,
                    distill_dt_factor=ddt,
                    static_kv_spans=(spans[ci:ci + 1]
                                     if spans is not None else None),
                )
                vels.append(v_i)
            velocity = jnp.concatenate(vels, axis=1)
            if rt.cfg_number >= 2:
                ct_ = self.statics.geo.chunk_tokens
                cache = self._sync_window(
                    cache=cache,
                    start=jnp.int32(slice_point) * ct_,
                    length=n_chunks * ct_,
                )
        else:
            velocity, cache = self._fwd(
                self.params,
                x_window=x_window,
                t=t,
                captions=caps.astype(self.dtype),
                caption_mask=masks,
                cache=cache,
                slice_point=jnp.int32(slice_point),
                kv_ranges=jnp.asarray(kv_ranges, jnp.int32),
                caption_dropout=dropout,
                distill_dt_factor=ddt,
                static_kv_spans=spans,
            )
        if nearly_clean:
            # mix the nearly-clean chunk's with-prefix and prefix-free
            # velocities, drop the extra chunk (dit_model.py:566-576)
            s = rt.distill_prev_chunks_scale
            first = slice(n_clean0 * cw, (n_clean0 + 1) * cw)
            v_first = velocity[:, first].astype(jnp.float32)
            v_extra = velocity[:, (n_chunks - 1) * cw:].astype(jnp.float32)
            mixed = (s * v_first + (1.0 - s) * v_extra).astype(velocity.dtype)
            velocity = jnp.concatenate(
                [velocity[:, : n_clean0 * cw], mixed,
                 velocity[:, (n_clean0 + 1) * cw: (n_chunks - 1) * cw]],
                axis=1)
            n_chunks -= 1
            t_vals = t_vals[:-1]
            chunk_is_clean = chunk_is_clean[:-1]
        if rt.cfg_number == 3 and not skip_prev_cfg:
            velocity = self._apply_3cfg(
                x_window, t_vals, velocity, null_cap, null_mask,
                chunk_is_clean, ddt)
        elif rt.cfg_number == 2 and not skip_prev_cfg \
                and len(t_vals) > int(np.sum(chunk_is_clean)):
            # 2-forward text-only CFG (TPU extension — the reference
            # dispatcher implements only 1 and 3): per-chunk text scales
            # on the cond/uncond halves; skipped for prefix feature
            # extraction (all chunks clean, velocity discarded)
            n_clean = int(np.sum(chunk_is_clean))
            t_den = np.asarray(t_vals)[n_clean:]
            _, text_s = self._cfg_scales(t_den)
            geo = self.statics.geo
            cw = geo.chunk_width
            v = velocity.reshape(velocity.shape[0], n_chunks, cw,
                                 *velocity.shape[2:])
            v_cond, v_unc = v[:1], v[1:]
            w = jnp.concatenate([
                jnp.zeros((n_clean,), jnp.float32),
                jnp.asarray(text_s, jnp.float32)]).reshape(1, -1, 1, 1, 1, 1)
            comb = v_unc + (1.0 + w) * (v_cond - v_unc)
            velocity = jnp.broadcast_to(comb, v.shape).reshape(
                velocity.shape)
        return velocity, cache

    def _apply_3cfg(self, x_window, t_vals, velocity, null_cap, null_mask,
                    chunk_is_clean, distill_dt_factor=None):
        """Reference 3-CFG combination over the denoising chunks."""
        geo = self.statics.geo
        cw = geo.chunk_width
        n_chunks = len(t_vals)
        n_clean = int(np.sum(chunk_is_clean))
        n_den = n_chunks - n_clean
        t_den = np.asarray(t_vals)[n_clean:]
        prev_s, text_s = self._cfg_scales(t_den)

        # per-chunk rows for the prefix-free uncond forward
        x_den = x_window[0, n_clean * cw:]
        x_den = x_den.reshape(n_den, cw, *x_den.shape[1:])
        t_u = jnp.asarray(t_den, jnp.float32).reshape(n_den, 1)
        caps_u = jnp.broadcast_to(
            null_cap[:, None], (n_den, 1, *null_cap.shape[1:])
        ).astype(self.dtype)
        masks_u = jnp.broadcast_to(null_mask[:, None],
                                   (n_den, 1, null_mask.shape[-1]))

        def chunks_of(row):
            d = row[n_clean * cw:]
            return d.reshape(n_den, cw, *d.shape[1:])

        if self.rt.window_dispatch in ("per_chunk", "scan") and n_den > 1:
            # the prefix-free uncond rows are independent — dispatch them
            # one chunk at a time for the same live-set reduction as the
            # main per-chunk window loop
            v_t, v_p = chunks_of(velocity[0]), chunks_of(velocity[1])
            comb = jnp.concatenate([
                self._fwd_uncond_combine(
                    self.params, x_den[i:i + 1], t_u[i:i + 1],
                    caps_u[i:i + 1], masks_u[i:i + 1],
                    v_t[i:i + 1], v_p[i:i + 1],
                    jnp.asarray(prev_s[i:i + 1]), jnp.asarray(text_s[i:i + 1]),
                    distill_dt_factor=distill_dt_factor)
                for i in range(n_den)], axis=0)
        else:
            comb = self._fwd_uncond_combine(
                self.params, x_den, t_u, caps_u, masks_u,
                chunks_of(velocity[0]), chunks_of(velocity[1]),
                jnp.asarray(prev_s), jnp.asarray(text_s),
                distill_dt_factor=distill_dt_factor)
        comb = comb.reshape(1, n_den * cw, *comb.shape[2:])
        # splice the combined denoising span back; clean prefix part is
        # discarded by the caller (velocity[:, cw:] under fwd_extra)
        out = jnp.concatenate(
            [velocity[:1, : n_clean * cw].astype(comb.dtype), comb], axis=1)
        return jnp.broadcast_to(out, velocity.shape)


class MagiVideoPipeline(MagiPipeline):
    """MAGI pipeline with per-chunk VAE decode (reference post_chunk_process,
    `pipeline/magi/video_process.py:348-388`: each clean chunk is decoded —
    optionally through tiled data-parallel processing — as it is yielded)."""

    def __init__(self, *args, vae=None, tile: bool = False,
                 decode_devices=None, **kwargs):
        """decode_devices: route the per-chunk decode to dedicated decode
        devices (disaggregated serving — the ViT-VAE is stateless per chunk,
        so this is the existing tile distribution pointed at a decode
        submesh; decode then overlaps the next chunk's denoise, cf.
        `parallel/disaggregated.py` for the Wan streaming analog). Implies
        tiled processing across those devices."""
        super().__init__(*args, **kwargs)
        self.vae = vae
        self.decode_devices = list(decode_devices) if decode_devices else None
        self.tile = tile or self.decode_devices is not None

    def generate_video(
        self,
        caption_emb: jax.Array,
        caption_mask: jax.Array,
        chunk_num: int,
        prefix_latents: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        chunk_callback: Optional[callable] = None,
    ) -> jax.Array:
        """Generate + decode chunk-by-chunk; returns pixels [1, T, H, W, 3]."""
        assert self.vae is not None, "MagiVideoPipeline needs a vae"
        pixels = []
        for idx, chunk in self.generate_chunks(
            caption_emb, caption_mask, chunk_num, prefix_latents, rng
        ):
            if self.tile:
                from ..parallel.tile_parallel import TileProcessor

                tp = TileProcessor(
                    fn=self.vae.decode,
                    scale_t=self.vae.cfg.patch_length,
                    scale_hw=self.vae.cfg.patch_size,
                    devices=self.decode_devices,
                )
                px = jnp.asarray(tp.process(
                    chunk, tile_t=chunk.shape[1],
                    tile_h=max(chunk.shape[2] // 2, 4),
                    tile_w=max(chunk.shape[3] // 2, 4),
                    overlap_h=2, overlap_w=2,
                ))
            else:
                px = self.vae.decode(chunk)
            pixels.append(px)
            if chunk_callback is not None:
                chunk_callback(px, idx)
        return jnp.concatenate(pixels, axis=1)


def magi_config_from_json(path: str):
    """Load (MagiModelConfig, MagiRuntimeConfig) from a JSON file shaped like
    `examples/configs/magi_4p5b.json` (mirroring the reference's
    `MagiConfig.from_json`, `models/magi/config/magi_config.py:73`)."""
    import json

    from ..models.magi.dit import MagiModelConfig

    with open(path) as f:
        d = json.load(f)

    def build(klass, sub):
        fields = {f.name for f in dataclasses.fields(klass)}
        kwargs = {}
        for k, v in (sub or {}).items():
            if k.startswith("_"):
                continue
            if k not in fields:
                raise KeyError(f"unknown {klass.__name__} key {k!r}")
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return klass(**kwargs)

    return (build(MagiModelConfig, d.get("model")),
            build(MagiRuntimeConfig, d.get("runtime")))


def magi_text_embeddings(prompt: str, embedder=None, params=None,
                         tokenizer=None, model_max_length: int = 120):
    """Prompt -> (caption_emb [1, L, 4096], caption_mask [1, L]) through the
    MAGI t5-v1_1-xxl tower with training-stage caption cleaning (reference
    `get_txt_embeddings`, `pipeline/magi/prompt_process.py:184-212` +
    `magi/t5/t5_model.py:129-159`). Pass an existing `MagiT5Embedder` or the
    pieces to build one."""
    from ..models.text.umt5 import MagiT5Embedder

    if embedder is None:
        embedder = MagiT5Embedder(params=params, tokenizer=tokenizer,
                                  model_max_length=model_max_length)
    embs, mask = embedder.get_text_embeddings([prompt])
    return embs, mask
