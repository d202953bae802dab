"""Block-size sweep of the production fixed-m flash kernel at the full
32760-token cache: larger kv blocks (fewer grid steps) and larger q blocks
(fewer KV re-streams) vs the current (1024, 2048) defaults."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.ops.flash_attention import flash_attention_prefix

B, SQ, SKV, H, D = 1, 4680, 32760, 12, 128
N_ITER = 32

_null = None


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def null_overhead():
    global _null
    if _null is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128))
        _sync(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(x))
            ts.append(time.perf_counter() - t0)
        _null = min(ts)
        print(f"# null overhead {_null*1e3:.2f} ms", flush=True)
    return _null


def emit(**kw):
    line = json.dumps({"exp": "blocks", **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


key = jax.random.key(0)
q = jax.random.normal(key, (B, SQ, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(key, 1), (B, SKV, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(key, 2), (B, SKV, H, D), jnp.bfloat16)
kv_len = jnp.full((B,), SKV, jnp.int32)

FLOPS = 4 * B * H * SQ * SKV * D  # QK + PV


def run(q_block, kv_block):
    import functools

    @jax.jit
    def many(q, k, v):
        def body(c, _):
            out = flash_attention_prefix(
                c, k, v, kv_len=kv_len, q_block=q_block, kv_block=kv_block)
            # feed output back (prevents DCE), keep dtype/scale stable
            nxt = (out * 1e-3 + q * (1 - 1e-3)).astype(q.dtype)
            return nxt, None

        c, _ = jax.lax.scan(body, q, None, length=N_ITER)
        return c

    out = many(q, k, v)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = many(q, k, v)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    ms = max(best - null_overhead(), 1e-9) / N_ITER * 1e3
    emit(q_block=q_block, kv_block=kv_block, ms=round(ms, 4),
         tfs=round(FLOPS / (ms * 1e-3) / 1e12, 2))


for qb, kb in [(1024, 2048), (1024, 4096), (1024, 8192),
               (2368, 2048), (2368, 4096), (4736, 4096),
               (1024, 1024)]:
    run(qb, kb)
