"""Rolling-window long-video serving point: local_attn_size=12 + sink 1
(the reference's long-video configuration, self_forcing_local_attn.json)
with int8 linears + fast-context. Measures sustained steady-state f/s over
the rolling cache — the configuration a production long-video deployment
would actually run."""
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


cfg = EngineConfig()
cfg.model.local_attn_size = 12
cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = False
cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
m, r = cfg.model, cfg.runtime

params = quantize_params(
    init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
xattn = gen.encode_text_context(
    jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16))
fpb = m.num_frame_per_block
noise = jax.random.normal(
    jax.random.key(1),
    (1, fpb, r.latent_height, r.latent_width, r.latent_channels),
).astype(jnp.bfloat16)
rng = jax.random.key(2)

# warm: fill the rolling window and compile both phases
cache = gen.init_cache()
frame = 0
for bi in range(8):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)

# sustained: 16 blocks in the rolling steady state
n = 16
t0 = time.perf_counter()
for bi in range(n):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    frame += fpb
_sync(x0)
sustained = n * fpb / (time.perf_counter() - t0)

line = json.dumps({
    "exp": "localattn_fast", "local_attn_frames": 12, "sink_frames": 1,
    "sustained_fps": round(sustained, 3),
    "sustained_s_per_block": round(fpb / sustained, 3),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
