"""Serving-capacity sweep: N concurrent streams with the rolling-window
long-video configuration (local_attn 12 + sink 1) + int8 linears + int8 KV
+ fast context.

History: B>=3 OOM'd (17.4-17.5 G needed) until the ring write's scatter
lowering was replaced with per-frame DUS (KVCacheSpec.granule) — the
scatter cost ~1.7x the cache set in program scratch (9.2 G at B=4, now
0.94 G). Post-fix B=4 runs: 3.418 total f/s (attention-bound, so B=2 is
the aggregate-throughput point and B=4 the capacity point).

Usage: python exp/r4_b4_window.py [batch]
"""
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
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.semi_ar import SemiARGenerator
from inferix_tpu.quant.api import quantize_params


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

cfg = EngineConfig()
cfg.model.local_attn_size = 12
cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = True
cfg.runtime = dataclasses.replace(cfg.runtime, batch_size=B,
                                  context_mode="last_step")
m, r = cfg.model, cfg.runtime

params = quantize_params(
    init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
xattn = gen.encode_text_context(
    jnp.zeros((B, m.text_len, m.text_dim), jnp.bfloat16))
fpb = m.num_frame_per_block
noise = jax.random.normal(
    jax.random.key(1),
    (B, fpb, r.latent_height, r.latent_width, r.latent_channels),
).astype(jnp.bfloat16)
rng = jax.random.key(2)

# warm: fill the rolling window and compile (the ring steady state is the
# only program shape once the window is full)
cache = gen.init_cache()
frame = 0
for bi in range(8):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)
_sync(cache.k)

# sustained: 16 blocks in the rolling steady state
n = 16
t0 = time.perf_counter()
for bi in range(n):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)
_sync(cache.k)
dt = time.perf_counter() - t0
total = n * fpb * B / dt

line = json.dumps({
    "exp": "bN_window_int8kv_fast", "batch": B,
    "local_attn_frames": 12, "sink_frames": 1,
    "total_frames_per_s": round(total, 3),
    "per_stream_frames_per_s": round(total / B, 3),
    "s_per_block_wall": round(dt / n, 3),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
