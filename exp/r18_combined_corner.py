"""Combined sub-1% corner A/B (VERDICT r4 item 5 / BASELINE r4 promise).

kv_alloc_pad (+0.81%) and kv_head_major (+0.7%) were each A/B'd against the
PRE-rope-flip base (2.797 f/s) and individually fell under the >1% flip
rule. The rope_mxu default flip moved the base to 2.962; this measures the
COMBINED corner (rope_mxu ON [now default] + alloc_pad + head_major)
against the current default — compounded sub-1% wins may cross the
threshold together. Flip rule unchanged: default flips only on >1% f/s.

Run alone on the chip (no concurrent processes — device contention
invalidates the A/B).
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp


def run_engine(tag, alloc_pad=False, head_major=False):
    from bench import run_config
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.quant.api import quantize_params

    cfg = EngineConfig()
    cfg.runtime.kv_alloc_pad = alloc_pad
    cfg.runtime.kv_head_major = head_major
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)
    params = quantize_params(params, cfg.quant)
    fps, ttfb = run_config(cfg, params, jnp.bfloat16)
    print(json.dumps({"case": tag, "frames_per_s": round(fps, 3),
                      "ttfb_s": round(ttfb, 3)}), flush=True)
    return fps


if __name__ == "__main__":
    base = run_engine("engine_int8_default")          # rope_mxu already ON
    combined = run_engine("engine_int8_pad_hm", alloc_pad=True,
                          head_major=True)
    print(json.dumps({"case": "verdict",
                      "gain_pct": round((combined / base - 1) * 100, 2),
                      "flip_default": combined / base > 1.01}), flush=True)
