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
    make_magi_statics,
)
from ..models.magi.scheduler import ChunkSchedule, MagiScheduleConfig
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
    # in-forward CP over the window when a mesh with sp>1 is supplied
    # (reference cp_strategy none/ulysses/cso, dit_module.py:1087-1195;
    # here "cso" = per-chunk shuffled-Ulysses island, the TPU CSO analog)
    cp_strategy: str = "none"
    # int8 + per-(token,head)-scale window cache: half the HBM of bf16 at
    # the bf16 kernel's attention rate (the fp8 e4m3 cache runs at half
    # rate on v5e — BASELINE.md). The 4.5B serving config on one chip.
    quantize_kv: bool = False


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
        # batch 2 = (conditional, unconditional) halves, reference x.chunk(2).
        # The distilled path (cfg_number == 1) runs a SINGLE conditional
        # forward like the reference dispatcher (dit_model.py:537-596) —
        # except under pp, where the two halves double as the pipeline's
        # microbatches.
        pp_on = mesh is not None and mesh.shape.get("pp", 1) > 1
        self.batch = 2 if (runtime.cfg_number >= 2 or pp_on) else 1
        sp_mode = "none"
        if (mesh is not None and mesh.shape.get("sp", 1) > 1
                and runtime.cp_strategy == "cso"
                and mesh.shape.get("pp", 1) == 1):
            if mesh.shape.get("tp", 1) > 1:
                raise ValueError(
                    "MAGI cp_strategy='cso' shards heads over sp only — "
                    "use tp=1 in the mesh (got tp="
                    f"{mesh.shape['tp']})")
            sp_mode = "cso"
        self.statics = make_magi_statics(
            model_cfg, self.batch, latent_h, latent_w, max_chunks, dtype,
            mesh=mesh, sp_mode=sp_mode, kv_dtype=kv_dtype,
            quantize_kv=quantize_kv or runtime.quantize_kv,
        )
        if self.statics.sp_mode == "cso":
            from ..core.monitoring import print_rank_0
            from ..parallel.distributed_attention import sp_comm_bytes_per_layer

            per_layer = sp_comm_bytes_per_layer(
                "cso", mesh.shape["sp"], 1, self.batch,
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
        # pp>1: run the layer stack through the microbatched GPipe pipeline
        # (cond/uncond halves stream through the stages — the reference's
        # work-queue PP overlap, video_generate.py:723-756)
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("pp", 1) > 1:
            from ..models.magi.dit import magi_forward_pp

            fwd_impl = functools.partial(magi_forward_pp, mesh=mesh)
        else:
            fwd_impl = magi_forward
        self._fwd = jax.jit(
            functools.partial(fwd_impl, statics=self.statics,
                              rope_tables=self.rope_tables),
            static_argnames=(),
            donate_argnames=("cache",),
        )

    # -- CFG ----------------------------------------------------------------

    def _cfg_scales(self, t_val: float) -> Tuple[float, float]:
        """Per-t-range (prev_chunk_scale, text_scale) lookup
        (reference forward_3cfg range buckets)."""
        rng = self.rt.cfg_t_range
        idx = 0
        for i in range(len(rng) - 1, -1, -1):
            if t_val >= rng[i]:
                idx = i
                break
        return (self.rt.prev_chunk_scales[idx], self.rt.text_scales[idx])

    # -- generation ---------------------------------------------------------

    def generate_chunks(
        self,
        caption_emb: jax.Array,    # [1, cap_len, cap_dim]
        caption_mask: jax.Array,   # [1, cap_len]
        chunk_num: int,
        prefix_latents: Optional[jax.Array] = None,  # [1, F0, H, W, C]
        rng: Optional[jax.Array] = None,
    ) -> Generator[Tuple[int, jax.Array], None, None]:
        """Yields (chunk_index, clean latents [1, chunk_width, H, W, C]) as
        chunks finish denoising — the reference `walk()` generator."""
        cfg, rt = self.cfg, self.rt
        geo = self.statics.geo
        cw = rt.chunk_width
        rng = rng if rng is not None else jax.random.key(rt.seed)

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
            noise2clean_kvrange=rt.noise2clean_kvrange,
            clean_chunk_kvrange=rt.clean_chunk_kvrange,
            clean_t=rt.clean_t,
        ))

        # state: all-chunk latents x, initialized to noise (cond/uncond halves
        # share noise), prefix chunks filled with the prefix
        rng, nkey = jax.random.split(rng)
        x = jax.random.normal(
            nkey, (1, chunk_num * cw, geo.latent_h, geo.latent_w,
                   cfg.in_channels)
        ).astype(self.dtype)
        # cond/uncond halves share noise (reference x.chunk(2) symmetry)
        x = jnp.broadcast_to(x, (self.batch, *x.shape[1:]))
        if prefix_latents is not None:
            pref = jnp.broadcast_to(
                prefix_latents, (self.batch, *prefix_latents.shape[1:]))
            x = x.at[:, : chunk_offset * cw].set(pref.astype(x.dtype))

        cache = init_kv_cache(self.statics.spec)

        # caption: conditional half = real caption, uncond half = zeros
        if self.batch == 2:
            cap = jnp.concatenate(
                [caption_emb, jnp.zeros_like(caption_emb)], axis=0
            )
            cmask = jnp.concatenate([caption_mask, caption_mask], axis=0)
        else:
            cap, cmask = caption_emb, caption_mask

        # prefix feature extraction at clean_t fills the cache
        if chunk_offset > 0:
            for ci in range(chunk_offset):
                cache = self._forward_window(
                    x[:, ci * cw:(ci + 1) * cw],
                    np.array([rt.clean_t]),
                    cap, cmask,
                    cache, slice_point=ci,
                    kv_ranges=np.array([[0, ci + 1]], np.int32),
                )[1]

        for step in range(sched.total_forward_steps):
            c_start, c_end, t_s, t_e = sched.window(step)
            extra_clean = sched.fwd_extra_1st_chunk(step)
            w_start = c_start - 1 if extra_clean else c_start
            n_chunks = c_end - w_start

            t_vals = sched.timesteps(step)
            if extra_clean:
                t_vals = np.concatenate([[rt.clean_t], t_vals])
            kv_ranges = sched.kv_ranges(step, include_clean=extra_clean)

            x_window = x[:, w_start * cw: c_end * cw]
            velocity, cache = self._forward_window(
                x_window, t_vals, cap, cmask, cache,
                slice_point=w_start, kv_ranges=kv_ranges,
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

            done = sched.mark_integrated(step)
            if done is not None:
                clean = x[:1, done * cw:(done + 1) * cw]
                yield done - chunk_offset, clean

    def _forward_window(self, x_window, t_vals, cap, cmask, cache,
                        slice_point, kv_ranges):
        """One (optionally CFG) window forward. Returns (velocity, cache)."""
        rt = self.rt
        n_chunks = len(t_vals)
        t = jnp.broadcast_to(
            jnp.asarray(t_vals, jnp.float32)[None], (self.batch, n_chunks)
        )
        caps = jnp.broadcast_to(
            cap[:, None], (self.batch, n_chunks, *cap.shape[1:])
        )
        masks = jnp.broadcast_to(
            cmask[:, None], (self.batch, n_chunks, cmask.shape[-1])
        )
        velocity, cache = self._fwd(
            self.params,
            x_window=x_window,
            t=t,
            captions=caps,
            caption_mask=masks,
            cache=cache,
            slice_point=jnp.int32(slice_point),
            kv_ranges=jnp.asarray(kv_ranges, jnp.int32),
        )
        if rt.cfg_number >= 2:
            # cond/uncond halves -> per-chunk text-scale combination (the
            # 3-cfg structure collapses to 2 forward halves here because the
            # uncond caption IS the zero caption; prev-chunk CFG uses the
            # denoising chunk's t bucket)
            v_cond, v_uncond = velocity[:1], velocity[1:]
            _, text_scale = self._cfg_scales(float(np.min(t_vals)))
            velocity = v_uncond + (1.0 + text_scale) * (v_cond - v_uncond)
            velocity = jnp.concatenate([velocity, velocity], axis=0)
        return velocity, cache


class MagiVideoPipeline(MagiPipeline):
    """MAGI pipeline with per-chunk VAE decode (reference post_chunk_process,
    `pipeline/magi/video_process.py:348-388`: each clean chunk is decoded —
    optionally through tiled data-parallel processing — as it is yielded)."""

    def __init__(self, *args, vae=None, tile: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.vae = vae
        self.tile = tile

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
