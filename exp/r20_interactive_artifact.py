"""On-chip interactive SERVING artifact (VERDICT r4 item 8).

Drives the interactive path end-to-end on the real chip — NOT bench.py's
inner loop: SelfForcingPipeline (int8+int8KV serving config, TRUE_STREAMING
per-block decode) under an InteractiveSession with the memory streaming
backend, 3 segments of 21 frames with 3-frame overlap carry, a prompt
switch applied at the segment-2 boundary and a pause/resume exercised at a
block boundary. Records per-segment TTFB (segment start -> first decoded
block HOST-VISIBLE in the backend queue) and sustained pixel f/s through
the serving path, then writes SERVING_r05.json.

Reference analog: run_interactive_generation
(`inferix/pipeline/base_pipeline.py:747-934`) + InteractiveSession
(`inferix/core/interactive/session.py:38-558`).

Run ALONE on the chip: python exp/r20_interactive_artifact.py
"""
import json
import sys
import threading
import time

import jax

TINY = "--tiny" in sys.argv
if TINY:  # CPU plumbing validation before paying the chip
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig, tiny_test_config
from inferix_tpu.core.interactive import InteractiveSession
from inferix_tpu.core.media.streaming_backend import create_streaming_backend
from inferix_tpu.core.types import InputApplyPolicy, StreamingMode
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline

cfg = tiny_test_config() if TINY else EngineConfig()
cfg.quant.enabled = True
cfg.quant.quantize_kv_cache = True
cfg.runtime.streaming_mode = StreamingMode.TRUE_STREAMING
if not TINY:
    cfg.runtime.frames_per_segment = 21
    cfg.runtime.overlap_frames = 3

pipe = SelfForcingPipeline(cfg, dtype=jnp.float32 if TINY else jnp.bfloat16)
session = InteractiveSession(apply_policy=InputApplyPolicy.NEXT_SEGMENT)
backend = create_streaming_backend("memory")
backend.connect()

seg_t0 = {"t": None, "ttfb": []}
frames_out = {"n": 0, "first_wall": None, "last_wall": None}
paused_once = {"done": False}


def stream_cb(pixels):
    # host-visibility point: fetch forces the decode to complete — the
    # serving path's real latency, unlike async-dispatch timestamps
    arr = np.asarray(jax.device_get(pixels))
    now = time.perf_counter()
    if seg_t0["t"] is not None:
        seg_t0["ttfb"].append(round(now - seg_t0["t"], 3))
        seg_t0["t"] = None
    if frames_out["first_wall"] is None:
        frames_out["first_wall"] = now
    frames_out["last_wall"] = now
    frames_out["n"] += arr.shape[1]
    backend.stream_batch(arr[0])


# drive inputs from a thread like a UI would: a prompt switch that lands at
# the segment-2 boundary, and a brief pause/resume mid-generation
def driver():
    time.sleep(1.0 if TINY else 12.0)
    session.submit_input(prompt="a different scene, new prompt")
    time.sleep(0.5 if TINY else 6.0)
    session.pause()
    time.sleep(0.3 if TINY else 1.5)
    session.resume()


threading.Thread(target=driver, daemon=True).start()


orig_eval = session.evaluate_checkpoint


def timed_eval(boundary, index):
    if boundary == "segment":
        seg_t0["t"] = time.perf_counter()
    return orig_eval(boundary, index)


session.evaluate_checkpoint = timed_eval

t0 = time.perf_counter()
segments = pipe.run_interactive_generation(
    session, "a calm ocean at sunset", num_segments=3,
    stream_callback=stream_cb)
wall = time.perf_counter() - t0

unique = sum(s.shape[1] for s in segments)
pixel_frames = frames_out["n"]
sustained = (pixel_frames - 12) / max(
    frames_out["last_wall"] - frames_out["first_wall"], 1e-9)

out_path = "/tmp/serving_tiny.json" if TINY else "/root/repo/SERVING_r05.json"
rec = {
    "exp": "interactive_serving_artifact",
    "tiny": TINY,
    "segments": len(segments),
    "unique_latent_frames": int(unique),
    "pixel_frames_streamed": int(pixel_frames),
    "wall_s": round(wall, 2),
    "per_segment_ttfb_s": seg_t0["ttfb"],
    "sustained_pixel_fps_after_first_block": round(sustained, 3),
    "backend": "memory",
    "events": "prompt switch @ ~12 s (NEXT_SEGMENT policy), pause 1.5 s",
    "note": ("serving-path numbers: per-block decode + host fetch + backend "
             "queue INCLUDED (bench.py's inner loop excludes them); the "
             "pause and the prompt-switch checkpoint are inside wall_s"),
    "finite": all(bool(np.isfinite(np.asarray(s)).all()) for s in segments),
}
print(json.dumps(rec), flush=True)
with open(out_path, "w") as f:
    json.dump(rec, f, indent=1)
backend.disconnect()
