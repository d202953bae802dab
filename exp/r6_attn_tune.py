"""Flash-kernel block-size sweep at the two serving shapes (perf-floor
chase, VERDICT weak#1: attention is ~80% MXU; the q/kv block shape sets
the MXU/VPU overlap and the grid-step count).

Sweeps (q_block, kv_block) for:
  - Wan 1.3B full-cache forward shape: q=4680, cache=32760, 12 heads (the
    2.80 f/s headline's 212 ms/forward of attention)
  - MAGI 4.5B window shape: q=3*12160 GQA-folded over 8 kv heads,
    cache=9*12160, int8+scales (the 8.42 s window forward)

Prints one JSON line per config; run on the real chip (warm cache reruns
are cheap — each config is one compile).
"""
import itertools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from inferix_tpu.ops.flash_attention import (
    flash_attention_gqa,
    flash_attention_gqa_quant,
)


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def wan_sweep():
    b, h, d = 1, 12, 128
    sq, skv = 4680, 32760
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, skv, h, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, skv, h, d),
                          jnp.bfloat16)
    flops = 4 * b * h * sq * skv * d
    for qb, kb in itertools.product((512, 944, 1024, 1536, 2048),
                                    (1024, 2048, 4096)):
        f = jax.jit(lambda q, k, v, qb=qb, kb=kb: flash_attention_gqa(
            q, k, v, kv_len=jnp.int32(skv), q_block=qb, kv_block=kb))
        try:
            ms = bench(f, q, k, v)
            print(json.dumps({"case": "wan_full", "q_block": qb,
                              "kv_block": kb, "ms": round(ms, 3),
                              "tf_s": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": "wan_full", "q_block": qb,
                              "kv_block": kb, "error": str(e)[:160]}),
                  flush=True)


def magi_sweep():
    from inferix_tpu.kvcache.cache import quantize_kv_block

    b, hq, hkv, d = 2, 24, 8, 128
    ct = 12160
    sq, skv = 3 * ct, 9 * ct
    key = jax.random.key(3)
    q = jax.random.normal(key, (b, sq, hq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, skv, hkv, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, skv, hkv, d),
                          jnp.bfloat16)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    flops = 4 * b * hq * sq * skv * d
    for qb, kb in itertools.product((512, 1024, 1536, 2048),
                                    (1024, 2048, 4096)):
        f = jax.jit(lambda q, qb=qb, kb=kb: flash_attention_gqa_quant(
            q, k_q, v_q, k_s, v_s, kv_len=jnp.int32(skv),
            q_block=qb, kv_block=kb))
        try:
            ms = bench(f, q, iters=5)
            print(json.dumps({"case": "magi_window_int8", "q_block": qb,
                              "kv_block": kb, "ms": round(ms, 2),
                              "tf_s": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": "magi_window_int8", "q_block": qb,
                              "kv_block": kb, "error": str(e)[:160]}),
                  flush=True)


if __name__ == "__main__":
    wan_sweep()
    magi_sweep()
