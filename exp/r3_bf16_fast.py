"""bf16 + fast-context clip/sustained measurement — how close does the
4-forward block get to the VERDICT 0.9 s/block (3.33 f/s) bf16 target?"""
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


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = EngineConfig()
cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
m, r = cfg.model, cfg.runtime
params = init_params(jax.random.key(0), m, dtype=jnp.bfloat16)
gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
xattn = gen.encode_text_context(
    jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16))
fpb = m.num_frame_per_block
noise = jax.random.normal(
    jax.random.key(1),
    (1, fpb, r.latent_height, r.latent_width, r.latent_channels),
).astype(jnp.bfloat16)
rng = jax.random.key(2)
num_blocks = r.num_frames // fpb

cache = gen.init_cache()
frame = 0
for bi in range(num_blocks + 2):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)

best = float("inf")
for _ in range(2):
    cache = gen.init_cache()
    frame = 0
    t0 = time.perf_counter()
    for bi in range(num_blocks):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
        frame += fpb
    _sync(x0)
    best = min(best, time.perf_counter() - t0)
clip_fps = num_blocks * fpb / best

n_sustain = 8
t0 = time.perf_counter()
for bi in range(n_sustain):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)
sustained_fps = n_sustain * fpb / (time.perf_counter() - t0)

line = json.dumps({
    "exp": "bf16_fast_context",
    "clip_fps": round(clip_fps, 3),
    "clip_s_per_block": round(fpb / clip_fps, 3),
    "sustained_fps": round(sustained_fps, 3),
    "sustained_s_per_block": round(fpb / sustained_fps, 3),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
