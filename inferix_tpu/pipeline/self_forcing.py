"""Self-Forcing pipeline: the flagship semi-AR text-to-video path.

Behavioral parity with the reference's outer pipeline + inner loop
(`inferix/pipeline/self_forcing/pipeline.py:26-810`,
`CausalInferencePipeline.py:57-502`): per-prompt noise sampling, per-request
KV cache wiring, few-step DMD denoising with context re-runs, decode-mode
dispatch (AFTER_ALL / PER_BLOCK / NO_DECODE), chunked VAE decode,
free-cache-before-VAE, block callbacks for progressive streaming, and
segment-chained streaming with overlap-latent carry.
"""
from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from ..core.config import EngineConfig
from ..core.types import DecodeMode, StreamingMode
from ..kvcache.manager import KVCacheManager, KVCacheRequest
from ..models.wan.causal_dit import Params, init_params
from ..models.wan.vae import CausalVAE, VAEConfig
from ..profiling.profiler import InferixProfiler
from .base import AbstractInferencePipeline
from .semi_ar import SemiARGenerator


class SelfForcingPipeline(AbstractInferencePipeline):
    def __init__(
        self,
        config: Optional[EngineConfig] = None,
        params: Optional[Params] = None,
        vae: Optional[CausalVAE] = None,
        text_encoder=None,
        profiler: Optional[InferixProfiler] = None,
        dtype=jnp.bfloat16,
    ):
        super().__init__(config or EngineConfig(), profiler)
        self._params = params
        self._vae = vae
        self._text_encoder = text_encoder
        self._dtype = dtype
        self.generator: Optional[SemiARGenerator] = None
        self.kv_manager: Optional[KVCacheManager] = None
        # disaggregated serving: when set (set_disaggregated_decode), the
        # TRUE_STREAMING per-block decode runs on dedicated decode devices
        # and overlaps with the next block's denoise (parallel/disaggregated)
        self.disagg_decoder = None

    def set_disaggregated_decode(self, devices, tiles=None, overlap: int = 2):
        """Route TRUE_STREAMING block decode to `devices` (spatially tiled
        across them). The generator keeps its own (sub)mesh; decode programs
        then execute concurrently with the next block's denoise — the
        multi-chip fix for the measured single-chip serialization
        (BASELINE.md round-5: interleaved wall = gen + decode exactly).
        Stream callbacks receive `PixelTiles` (device-resident handles)
        instead of a pixel array."""
        from ..parallel.disaggregated import DisaggregatedVAEDecoder

        if self.generator is None:
            self.setup()
        assert self._vae is not None, (
            "disaggregated decode needs a VAE (decode_mode=NO_DECODE builds "
            "none — construct the pipeline with an explicit vae)")
        self.disagg_decoder = DisaggregatedVAEDecoder(
            self._vae, devices, tiles=tiles, overlap=overlap)
        return self.disagg_decoder

    # -- lifecycle ----------------------------------------------------------

    def _initialize_pipeline(self) -> None:
        cfg = self.config
        if self._params is None:
            if cfg.model_path:
                from ..utils.checkpoint import load_self_forcing_checkpoint

                self._params = load_self_forcing_checkpoint(
                    cfg.model_path, cfg.model, dtype=self._dtype
                )
            else:
                self._params = init_params(
                    jax.random.key(cfg.runtime.seed), cfg.model,
                    dtype=self._dtype,
                )
        if cfg.quant.enabled:
            from ..quant.api import quantize_params

            self._params = quantize_params(self._params, cfg.quant)
        # trace-time globals are set UNCONDITIONALLY (True or False) so a
        # second pipeline in the same process can never inherit a previous
        # pipeline's setting (in-process A/Bs depend on this)
        from ..ops.rope import set_rope_impl
        from ..quant.api import set_fused_act_quant

        set_fused_act_quant(cfg.quant.enabled and cfg.quant.fused_act_quant)
        set_rope_impl("mxu" if cfg.runtime.rope_mxu else "pairs")
        if getattr(cfg.runtime, "vae_conv_impl", "xla") != "xla":
            from ..models.wan.vae import set_vae_conv_impl

            set_vae_conv_impl(cfg.runtime.vae_conv_impl)
        self.generator = SemiARGenerator(cfg, self._params, dtype=self._dtype)
        self.kv_manager = KVCacheManager(self.generator.statics.spec)
        if self._vae is None and cfg.runtime.decode_mode != DecodeMode.NO_DECODE:
            self._vae = CausalVAE(VAEConfig(), key=jax.random.key(0))

    @property
    def vae(self) -> CausalVAE:
        return self._vae

    # -- text conditioning --------------------------------------------------

    def _encode_prompts(self, prompts: List[str]):
        """Text-encoder features -> per-layer cross-attn KV cache. Without a
        text encoder (tests, precomputed-embedding mode), zeros are used."""
        m, r = self.config.model, self.config.runtime
        if self._text_encoder is not None:
            feats = self._text_encoder(prompts)
        else:
            feats = jnp.zeros(
                (r.batch_size, m.text_len, m.text_dim), self._dtype
            )
        return self.generator.encode_text_context(feats)

    # -- main entry ---------------------------------------------------------

    def run_text_to_video(
        self,
        prompts: List[str],
        num_frames: Optional[int] = None,
        initial_latent: Optional[jax.Array] = None,
        return_latents: bool = False,
        decode_mode: Optional[DecodeMode] = None,
        block_callback: Optional[Callable] = None,
        seed: Optional[int] = None,
    ):
        self.setup()
        cfg, r = self.config, self.config.runtime
        decode_mode = decode_mode or r.decode_mode
        num_frames = num_frames or r.num_frames
        rng = jax.random.key(seed if seed is not None else r.seed)

        self.profiler.start_session("text_to_video", prompts=len(prompts))
        requests = [KVCacheRequest(f"req_{i}") for i in range(r.batch_size)]
        for req in requests:
            self.kv_manager.allocate_slots(req)

        with self.profiler.stage("initialization"):
            xattn = self._encode_prompts(prompts)
            rng, nkey = jax.random.split(rng)
            noise = jax.random.normal(
                nkey,
                (r.batch_size, num_frames, r.latent_height, r.latent_width,
                 r.latent_channels),
            ).astype(self._dtype)

        t0 = time.perf_counter()

        def timed_callback(block_latent, idx):
            # time_ms is the PER-BLOCK duration (the profiler summary /
            # analyzer / extract_metrics contract), so reset the clock
            # after each record
            nonlocal t0
            self.profiler.record_block_computation(
                idx, block_latent.shape[1],
                (time.perf_counter() - t0) * 1e3,
            )
            t0 = time.perf_counter()
            if block_callback is not None:
                return block_callback(block_latent, idx)

        with self.profiler.stage("diffusion_generation"):
            latents, cache = self.generator.generate(
                noise, xattn, rng,
                initial_latent=initial_latent,
                cache=self.kv_manager.cache,
                block_callback=timed_callback,
            )
            latents.block_until_ready()
        self.kv_manager.update(cache)

        if r.free_cache_before_vae and decode_mode != DecodeMode.NO_DECODE:
            self.kv_manager.clear()
        for req in requests:
            self.kv_manager.free(req)

        video = self._decode_latent(self._vae, latents, decode_mode)
        self.profiler.end_session()
        if decode_mode == DecodeMode.NO_DECODE:
            return latents
        if return_latents:
            return video, latents
        return video

    def run_image_to_video(self, prompts: List[str], image_latent: jax.Array,
                           **kwargs):
        """Image conditioning = 1-frame initial latent prefix."""
        return self.run_text_to_video(
            prompts, initial_latent=image_latent, **kwargs
        )

    # -- streaming segment hook ---------------------------------------------

    def _generate_segment_with_streaming(
        self,
        prompt: str,
        initial_latent: Optional[jax.Array],
        stream_callback: Optional[Callable],
        segment_index: int,
        block_callback: Optional[Callable] = None,
    ) -> jax.Array:
        """One segment with per-block streaming decode (TRUE_STREAMING) or
        buffered decode after the segment (DEFERRED_DECODE)."""
        cfg, r = self.config, self.config.runtime
        mode = self.resolve_streaming_mode()
        new_frames = r.frames_per_segment - (
            initial_latent.shape[1] if initial_latent is not None else 0
        )

        decode_state = {"cache": None, "first": True}

        def stream_block(block_latent, idx):
            ok = True
            if block_callback is not None:
                ok = block_callback(block_latent, idx)
            if stream_callback is None:
                return ok
            if mode == StreamingMode.TRUE_STREAMING and self._vae is not None:
                if self.disagg_decoder is not None:
                    # disaggregated: decode dispatches to the decode devices
                    # and EXECUTES while the next block's denoise runs on the
                    # generator submesh; callback gets device-resident
                    # PixelTiles (already in [0, 1]) — nothing here blocks
                    px, decode_state["cache"] = self.disagg_decoder.decode_chunk(
                        block_latent, decode_state["cache"],
                        first=decode_state["first"],
                    )
                    decode_state["first"] = False
                    stream_callback(px)
                    return ok
                # whole-block decode (T=3): matches per-frame streaming
                # (resample seeds the first block's temporal-conv cache with
                # the per-frame zeros; ~1e-7 conv-fusion noise) — one conv
                # dispatch chain instead of three
                out, decode_state["cache"] = self._vae.decode_chunk(
                    block_latent, decode_state["cache"],
                    first=decode_state["first"],
                )
                decode_state["first"] = False
                stream_callback(jnp.clip(out, -1, 1) * 0.5 + 0.5)
            return ok

        latents = self.run_text_to_video(
            [prompt],
            num_frames=new_frames,
            initial_latent=initial_latent,
            decode_mode=DecodeMode.NO_DECODE,
            block_callback=stream_block,
            seed=r.seed + segment_index,
        )

        if mode == StreamingMode.DEFERRED_DECODE and stream_callback is not None \
                and self._vae is not None:
            # stream only the NEW frames — the returned latents carry the
            # overlap prefix, which the previous segment already streamed
            ninit = (initial_latent.shape[1]
                     if initial_latent is not None else 0)
            video = self._decode_latent(self._vae, latents[:, ninit:],
                                        DecodeMode.AFTER_ALL)
            stream_callback(video)
        return latents
