"""Isolated MAGI-4.5B-shape linears on one v5e: bf16 vs XLA int8 W8A8
(dynamic per-token act quant), serialized-feedback scan timing.

Motivation: the 4.5B window forward measured fp8-dequant 12.0 s and int8
30.6 s per forward — int8 SLOWER, opposite of the Wan measurements
(1.29-1.44x). This isolates whether XLA's int8 dot degrades at the MAGI
shapes (M=48600 tokens) or whether the e2e regression is orchestration
(layout/remat around the layer scan).
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_ITER = 16


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


_null = None


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
    return _null


def timeit(fn, *args, n=N_ITER, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - null_overhead(), 1e-9) / n


def emit(name, **kw):
    line = json.dumps({"exp": name, **{k: (round(v, 4) if isinstance(v, float)
                                           else v) for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


def fold(y, c, k):
    return (y[:, :k] * jax.lax.rsqrt(
        jnp.mean(jnp.square(y[:, :k].astype(jnp.float32))) + 1e-6
    ).astype(y.dtype)).astype(c.dtype)


key = jax.random.key(7)
# MAGI 4.5B shapes: fc1, fc2, qkv-ish square, joint proj
for (m, k, n) in [(48600, 3072, 12288), (48600, 12288, 3072),
                  (48600, 3072, 3072), (48600, 6144, 3072)]:
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 16), -127, 127
                  ).astype(jnp.int8)
    wsc = jnp.full((n,), 1 / 16, jnp.float32)
    gf = 2 * m * k * n / 1e9

    @jax.jit
    def run_bf16(x, w):
        def body(c, _):
            y = jnp.dot(c, w)
            if y.shape[1] >= k:
                c2 = fold(y, c, k)
            else:
                c2 = c * (1.0 + jnp.mean(y.astype(jnp.float32)
                                         ).astype(c.dtype) * 1e-20)
            return c2, None
        c, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return c

    @jax.jit
    def run_i8(x, w8, wsc):
        def body(c, _):
            cf = c.astype(jnp.float32)
            am = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1, keepdims=True),
                             1e-8)
            cq = jnp.clip(jnp.round(cf * (127.0 / am)), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(cq, w8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * (am / 127.0) * wsc[None]
                 ).astype(c.dtype)
            if y.shape[1] >= k:
                c2 = fold(y, c, k)
            else:
                c2 = c * (1.0 + jnp.mean(y.astype(jnp.float32)
                                         ).astype(c.dtype) * 1e-20)
            return c2, None
        c, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return c

    t_bf = timeit(run_bf16, x, w)
    emit("magi_mm", shape=[m, k, n], variant="bf16", ms=t_bf * 1e3,
         tfs=gf / t_bf / 1e3)
    t = timeit(run_i8, x, w8, wsc)
    emit("magi_mm", shape=[m, k, n], variant="i8_xla", ms=t * 1e3,
         tfs=gf / t / 1e3, speedup=t_bf / t)
