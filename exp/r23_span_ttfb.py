"""Engine A/B for span_grid="ttfb" (early-blocks-only trimmed grids).

Round-4 measured span_grid=True at -8.3% TTFB / -1.9% clip f/s
(wan_span_final.log). The "ttfb" mode buckets only while the bound is
<= half the cache, so steady-state blocks dispatch the SAME program as
span grids off — expectation: the TTFB win at zero clip-throughput cost.

Headline int8 config (W8A8 linears, bf16 KV). Each case warms a FULL
clip first (all bucket programs compiled) before timing TTFB and the
clip — unlike bench.py, whose warmup only compiles block 0.
"""
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


base = init_params(jax.random.key(0), EngineConfig().model,
                   dtype=jnp.bfloat16)

for case in ("off", "ttfb", "on"):
    cfg = EngineConfig()
    cfg.quant.enabled = True
    cfg.quant.dtype = "int8"
    cfg.quant.granularity = "per_channel"
    cfg.runtime.span_grid = {"off": False, "ttfb": "ttfb", "on": True}[case]
    params = quantize_params(base, cfg.quant)
    gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
    m, r = cfg.model, cfg.runtime
    xattn = gen.encode_text_context(
        jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16))
    fpb = m.num_frame_per_block
    noise = jax.random.normal(
        jax.random.key(1), (1, fpb, r.latent_height, r.latent_width,
                            r.latent_channels)).astype(jnp.bfloat16)
    num_blocks = r.num_frames // fpb

    # warm EVERY program the clip will dispatch (all span buckets)
    rng = jax.random.key(2)
    cache = gen.init_cache()
    frame = 0
    for _ in range(num_blocks):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
        frame += fpb
    _sync(x0)
    _sync(cache.k)

    cache = gen.init_cache()
    t0 = time.perf_counter()
    x0, cache = gen.denoise_block(cache, xattn, noise, jax.random.key(3), 0)
    _sync(x0)
    ttfb = time.perf_counter() - t0
    _sync(cache.k)

    cache = gen.init_cache()
    rng = jax.random.key(4)
    t0 = time.perf_counter()
    frame = 0
    for _ in range(num_blocks):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
        frame += fpb
    _sync(x0)
    _sync(cache.k)
    fps = num_blocks * fpb / (time.perf_counter() - t0)

    line = json.dumps({"exp": "span_ttfb_ab", "case": case,
                       "frames_per_s": round(fps, 3),
                       "ttfb_s": round(ttfb, 3)})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")
    del gen, params
