"""Long-video TRUE_STREAMING: 10 segments x 21 frames with 3-frame overlap
carry (183 unique latent frames), int8 linears + fast context, PER_BLOCK
VAE decode interleaved on the same chip — the complete latents->pixels
long-video serving loop (the NO_DECODE version of this scenario sustains
3.218 latent f/s at HEAD; this adds the decode).

Pixels stay ON DEVICE (a production consumer reads them over PCIe at
~10 ms; fetching ~100 MB/segment through the axon HTTP relay would time
the tunnel, not the engine — the serving artifact SERVING_r05.json records
that path separately). The final block_until_ready forces every decode
program to have executed.

VAE_CONV=halo_w8a8 selects the quality-gated int8-conv decode
(QUALITY_r05 w8a8_decode gate).
"""
import dataclasses
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig
from inferix_tpu.core.types import StreamingMode
from inferix_tpu.models.wan.vae import set_vae_conv_impl, set_vae_upsample_impl
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline

_IMPL = os.environ.get("VAE_CONV", "xla")
set_vae_conv_impl(_IMPL)
set_vae_upsample_impl(os.environ.get("VAE_UPSAMPLE", "repeat"))

cfg = EngineConfig()
# the rolling-window TRUE_STREAMING serving config (as r4_truestream.py):
# full-cache generation (5.6 GB bf16 KV) + the VAE decode working set OOMs
# one 15.75 GiB v5e — the 12-frame window + sink + int8 KV is the
# long-video serving mode (reference: >=24 GB GPU for TRUE_STREAMING,
# pipeline.py:510-523; the window cache makes it fit 16 GB-class chips)
cfg.model.local_attn_size = 12
cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = True
cfg.runtime = dataclasses.replace(
    cfg.runtime, context_mode="last_step",
    streaming_mode=StreamingMode.TRUE_STREAMING)

pipe = SelfForcingPipeline(cfg, dtype=jnp.bfloat16)
pipe.setup()
# DISAGG=N (pod sessions): route the PER_BLOCK decode to the last N chips
# (spatially tiled); decode then overlaps the next block's denoise. The
# callback below works unchanged — PixelTiles is array-like for .shape and
# a registered pytree for block_until_ready.
pipe.vae.params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    pipe.vae.params)
# (after the bf16 cast — the decoder snapshots VAE params at construction)
_n_dec = int(os.environ.get("DISAGG", "0"))
if _n_dec:
    pipe.set_disaggregated_decode(jax.devices()[-_n_dec:])

state = {"n": 0, "last": None}


def cb(px):
    state["n"] += int(px.shape[1])
    state["last"] = px  # keep only the latest handle: pixels are consumed
    # in production; holding all ~800 frames would add ~1 GB of HBM


# warm segment compiles every program (gen blocks + first/steady decode)
_ = pipe.run_streaming_generation(["warmup"], num_segments=1,
                                  stream_callback=cb,
                                  offload_segments=True)
jax.block_until_ready(state["last"])
state["n"] = 0

n_seg = 10
t0 = time.perf_counter()
segs = pipe.run_streaming_generation(["x"], num_segments=n_seg,
                                     stream_callback=cb,
                                     offload_segments=True)
jax.block_until_ready(state["last"])
wall = time.perf_counter() - t0
frames = sum(int(s.shape[1]) for s in segs)
_lastpx = (state["last"].tiles[0] if _n_dec else state["last"])
finite = bool(np.isfinite(np.asarray(
    jax.device_get(_lastpx[0, -1, :2, :2, 0]))).all())
line = json.dumps({
    "metric": "long_video_true_streaming", "conv_impl": _IMPL,
    "segments": n_seg, "unique_latent_frames": frames,
    "pixel_frames_streamed": state["n"], "wall_s": round(wall, 1),
    "sustained_pixel_frames_per_s": round(state["n"] / wall, 3),
    "sustained_latent_frames_per_s": round(frames / wall, 3),
    "finite": finite,
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
