"""Long-video streaming re-measurement with the fast-context serving mode:
10 segments x 21 frames, 3-frame overlap carry (183 unique frames), int8
linears + bf16 KV, NO_DECODE, segments offloaded to host — same scenario as
the round-2 baseline run (BASELINE.md "Long-video streaming": 1.64 f/s with
context_mode='rerun')."""
import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig
from inferix_tpu.core.types import DecodeMode
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline

cfg = EngineConfig()
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = False
cfg.runtime = dataclasses.replace(
    cfg.runtime, context_mode="last_step", decode_mode=DecodeMode.NO_DECODE)

pipe = SelfForcingPipeline(cfg, dtype=jnp.bfloat16)
pipe.setup()

# warm the compiled programs with one short segment
_ = pipe.run_streaming_generation(["warmup"], num_segments=1,
                                  offload_segments=True)

n_seg = 10
t0 = time.perf_counter()
segs = pipe.run_streaming_generation(["x"], num_segments=n_seg,
                                     offload_segments=True)
wall = time.perf_counter() - t0
frames = sum(int(s.shape[1]) for s in segs)
finite = all(bool(np.isfinite(np.asarray(s)).all()) for s in segs)
line = json.dumps({
    "metric": "long_video_streaming_fast_context", "segments": n_seg,
    "unique_frames": frames, "wall_s": round(wall, 1),
    "sustained_frames_per_s": round(frames / wall, 3), "finite": finite,
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
