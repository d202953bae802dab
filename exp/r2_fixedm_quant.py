"""int8-KV attention with the max-free softmax: v1(bf16 PV)+fixedm vs the
v2(int8 PV)+runmax incumbent at the full 32760-token cache."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.kvcache.cache import quantize_kv_block
from inferix_tpu.ops.flash_attention import (
    flash_attention_prefix, flash_attention_prefix_quant,
    flash_attention_prefix_quant_v2)

B, SQ, SKV, H, D = 1, 4680, 32760, 12, 128
N_ITER = 32


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
    line = json.dumps({"exp": name, **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


def main():
    key = jax.random.key(11)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, SQ, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, SKV, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, SKV, H, D), jnp.bfloat16)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    kv_len = jnp.int32(SKV)
    gf = 4 * B * H * SQ * SKV * D / 1e9

    # accuracy of v1+fixedm vs bf16 fixedm
    ref = flash_attention_prefix(q, k, v, kv_len)
    got = flash_attention_prefix_quant(q, k_q, v_q, k_s, v_s, kv_len,
                                       softmax="fixedm")
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    emit("quant_fixedm_acc", max_abs_err=float(err))

    def chain(fn):
        @jax.jit
        def run(c0):
            def body(c, _):
                o = fn(c)
                return (c + o * 1e-24).astype(c.dtype), None
            c, _ = jax.lax.scan(body, c0, None, length=N_ITER)
            return c
        return run

    for name, fn in [
        ("quant_v1_fixedm", lambda c: flash_attention_prefix_quant(
            c, k_q, v_q, k_s, v_s, kv_len, softmax="fixedm")),
        ("quant_v1_runmax", lambda c: flash_attention_prefix_quant(
            c, k_q, v_q, k_s, v_s, kv_len, softmax="runmax")),
        ("quant_v2_runmax", lambda c: flash_attention_prefix_quant_v2(
            c, k_q, v_q, k_s, v_s, kv_len)),
    ]:
        try:
            t = timeit(chain(fn), q)
            emit("quant_fixedm", variant=name, ms=t * 1e3, tfs=gf / t / 1e3)
        except Exception as e:
            emit("quant_fixedm", variant=name, error=repr(e)[:200])


if __name__ == "__main__":
    main()
