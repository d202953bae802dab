"""Engine-level A/B for the pad-free cache allocation
(RuntimeConfig.kv_alloc_pad): the round-3 trace attributes ~9 ms/forward
to the flash kernel's per-layer K/V pads of the 32760-token cache to
32768 (exp/r6_results/op_breakdown.log %pad.83/84). Padding the
ALLOCATION instead makes those ops vanish; generation is bit-equal
(tests/test_kv_cache.py alloc-pad suite). Flip rule (BASELINE.md 5b
protocol): default ON if engine_int8_pad beats engine_int8_tm by >1%
f/s, else stays opt-in.

Run AFTER run_tpu_queue2.sh drains (one chip, no HBM contention).
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp


def run_engine(alloc_pad, quant=True):
    from bench import run_config
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.quant.api import quantize_params

    cfg = EngineConfig()
    cfg.runtime.kv_alloc_pad = alloc_pad
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)
    if quant:
        cfg.quant.enabled = True
        params = quantize_params(params, cfg.quant)
    fps, ttfb = run_config(cfg, params, jnp.bfloat16)
    tag = "pad" if alloc_pad else "tm"
    print(json.dumps({"case": f"engine_{'int8' if quant else 'bf16'}_{tag}",
                      "frames_per_s": round(fps, 3),
                      "ttfb_s": round(ttfb, 3)}), flush=True)
    return fps


if __name__ == "__main__":
    # baseline first (warm compile cache from bench.py), then the padded
    # allocation (fresh compile, persistently cached for the next round)
    base = run_engine(False, quant=True)
    padded = run_engine(True, quant=True)
    print(json.dumps({"case": "verdict",
                      "gain_pct": round((padded / base - 1) * 100, 2),
                      "flip_default": padded / base > 1.01}))
