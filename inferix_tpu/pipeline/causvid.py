"""CausVid pipeline: multi-segment rollout with VAE re-encoded overlap.

Behavioral parity with `inferix/pipeline/causvid/pipeline.py:16-388`:
per-segment 21-frame semi-AR inference with the segment's start latents fed
as a clean prefix (t=0 context caching), then the boundary pixel frame is
re-encoded THROUGH the VAE encoder and concatenated with the tail latents to
form the next segment's start latents (:299-332 `_encode_start_frame`) —
grounding the next segment in decoded pixels rather than latents alone.
Supports same-prompt and per-segment-prompt rollouts; the KV cache is reset
per segment (:216,260).

The CausVid model is the simpler causal Wan variant (raw-tensor KV cache in
the reference, `models/causvid/causal_model.py`); under our functional cache
design it is the same backbone with CausVid's generation hyperparameters, so
the pipeline reuses SemiARGenerator.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..core.config import EngineConfig
from ..core.types import DecodeMode
from ..kvcache.manager import KVCacheRequest
from ..profiling.profiler import InferixProfiler
from .self_forcing import SelfForcingPipeline


def causvid_config() -> EngineConfig:
    """CausVid generation defaults (reference example/causvid configs:
    3-frame blocks, 21-frame segments, DMD few-step schedule)."""
    cfg = EngineConfig()
    cfg.runtime.overlap_frames = 3
    return cfg


class CausVidPipeline(SelfForcingPipeline):
    """Rollout pipeline on top of the shared semi-AR generator."""

    def run_rollouts(
        self,
        prompts: Union[str, Sequence[str]],
        num_rollouts: int = 3,
        num_overlap_frames: int = 3,
        segment_callback: Optional[Callable] = None,
        seed: Optional[int] = None,
    ) -> List[jax.Array]:
        """Generate `num_rollouts` chained 21-frame segments. `prompts` may be
        one prompt (same-prompt mode) or one per segment. Returns the list of
        per-segment PIXEL videos with overlap frames trimmed (reference
        `all_video` accounting, pipeline.py:305-307)."""
        self.setup()
        assert self._vae is not None, "CausVid rollouts need a VAE"
        r = self.config.runtime
        if isinstance(prompts, str):
            prompts = [prompts] * num_rollouts
        assert len(prompts) >= num_rollouts

        videos: List[jax.Array] = []
        start_latents: Optional[jax.Array] = None
        base_seed = seed if seed is not None else r.seed

        for seg in range(num_rollouts):
            # fresh KV cache per segment (reference clears per prompt)
            self.kv_manager.clear()
            new_frames = r.frames_per_segment - (
                start_latents.shape[1] if start_latents is not None else 0
            )
            latents = self.run_text_to_video(
                [prompts[seg]],
                num_frames=new_frames,
                initial_latent=start_latents,
                decode_mode=DecodeMode.NO_DECODE,
                seed=base_seed + seg,
            )
            video = self._decode_latent(self._vae, latents,
                                        DecodeMode.AFTER_ALL)

            if seg < num_rollouts - 1:
                start_latents = self._encode_start_latents(
                    video, latents, num_overlap_frames
                )

            # trim the trailing overlap pixels except on the last segment
            if seg < num_rollouts - 1:
                keep = video.shape[1] - (4 * (num_overlap_frames - 1) + 1)
                videos.append(video[:, :keep])
            else:
                videos.append(video)
            if segment_callback is not None:
                segment_callback(videos[-1], seg)
        return videos

    def _encode_start_latents(
        self, video: jax.Array, latents: jax.Array, num_overlap_frames: int
    ) -> jax.Array:
        """Boundary frame -> VAE encoder -> 1 latent frame, concatenated with
        the last (overlap-1) generated latents (reference
        `_encode_start_frame` + concat, pipeline.py:299-332)."""
        boundary_idx = video.shape[1] - (4 * (num_overlap_frames - 1) + 1)
        # back to [-1, 1] pixel range for the encoder
        frame = video[:, boundary_idx:boundary_idx + 1] * 2.0 - 1.0
        start_frame = self._vae.encode(frame)  # [B, 1, h, w, z]
        if num_overlap_frames <= 1:
            # overlap 1 = the re-encoded boundary frame alone (a -0 slice
            # would take the WHOLE previous segment's latents)
            return start_frame
        return jnp.concatenate(
            [start_frame, latents[:, -(num_overlap_frames - 1):]], axis=1
        )
