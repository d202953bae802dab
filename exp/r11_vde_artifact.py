"""End-to-end LV-Bench/VDE artifact (VERDICT r3 item 7).

Generates a small clip set through the ACTUAL pipeline+CLI path
(SelfForcingPipeline -> VAE decode -> save_video), then scores every clip
with eval/vde.py through the registered metric factory — real metric
plug-ins where weight files exist (none in this environment), the
weight-free proxies otherwise — and writes VDE_r04.json. This demonstrates
the BASELINE quality-gate execution path end-to-end (reference:
`LV-Bench/vde.py:17-46`), not just the unit tests.

Run on the chip: python exp/r11_vde_artifact.py            (1.3B geometry)
Plumbing check:  python exp/r11_vde_artifact.py --tiny     (CPU)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--tiny", action="store_true")
ap.add_argument("--clips", type=int, default=2)
ap.add_argument("--frames", type=int, default=21)
ap.add_argument("--out", default="VDE_r04.json")
a = ap.parse_args()

if a.tiny:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from inferix_tpu.core.config import EngineConfig, tiny_test_config
from inferix_tpu.core.media.streaming_backend import latents_to_uint8
from inferix_tpu.core.media.video_utils import save_video
from inferix_tpu.core.types import DecodeMode
from inferix_tpu.eval.flow_metrics import register_flow_metrics
from inferix_tpu.eval.vde import BUILTIN_METRICS, evaluate_video
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline

cfg = tiny_test_config() if a.tiny else EngineConfig()
if not a.tiny:
    cfg.quant.enabled = True          # the int8 headline serving config
    cfg.quant.quantize_kv_cache = True
frames = min(a.frames, 5) if a.tiny else a.frames
dtype = jnp.float32 if a.tiny else jnp.bfloat16

register_flow_metrics()
real_used = {}
try:
    # real plug-ins activate only where weight files are present
    from inferix_tpu.eval.vbench_real import register_real_metrics

    spec_env = os.environ.get("VBENCH_WEIGHTS_JSON")
    if spec_env and os.path.exists(spec_env):
        real_used = register_real_metrics(json.load(open(spec_env)))
except Exception as e:  # loud in the log, proxies still score
    print(f"real metrics unavailable ({e}); proxies in effect")

pipe = SelfForcingPipeline(cfg, dtype=dtype)
os.makedirs("exp/vde_clips", exist_ok=True)
clips = []
for i in range(a.clips):
    t0 = time.perf_counter()
    video = pipe.run_text_to_video(
        [f"clip {i}"], num_frames=frames, seed=100 + i,
        decode_mode=DecodeMode.AFTER_ALL)
    # block before stopping the clock: jax dispatch is async, so without
    # this the timing excludes most of the decode's execution (the round-4
    # VDE_r04 "11.6 pixel f/s" was inflated exactly this way — the honest
    # AFTER_ALL number is the ~7.4 f/s class)
    jax.block_until_ready(video)
    gen_s = time.perf_counter() - t0
    px = latents_to_uint8(np.asarray(video[0]))
    path = save_video(px, f"exp/vde_clips/clip_{i}.mp4")
    clips.append((path, px, round(gen_s, 1)))
    print(f"clip {i}: {px.shape} in {gen_s:.1f}s -> {path}", flush=True)

results = []
for path, px, gen_s in clips:
    v = px.astype(np.float32) / 255.0
    # chunk on DECODED pixel frames (>=2 chunks or drift-vs-chunk0 is 0)
    scores = evaluate_video(v, n_chunks=max(2, min(10, v.shape[0] // 3)))
    results.append({"clip": path, "generate_s": gen_s,
                    "frames": int(v.shape[0]), "vde": scores})
    print(json.dumps(results[-1]), flush=True)

out = {
    "config": "tiny-cpu" if a.tiny else "self-forcing-1.3B int8+int8KV",
    "weights": "random-init (no released checkpoints in this environment)",
    "metrics_registered": sorted(BUILTIN_METRICS),
    "real_metric_plugins_active": sorted(real_used),
    "note": ("VDE drift on random-weight generations exercises the full "
             "gate path (generate -> decode -> chunk -> metric -> "
             "drift-vs-chunk0 aggregation); absolute values are not "
             "quality claims until real checkpoints exist"),
    "results": results,
}
with open(a.out, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {a.out}")
