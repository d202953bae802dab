"""MAGI window-attention microbench on one v5e: the per-chunk GQA flash
call at the 4.5B window shape, with bf16 / fp8-e4m3 / int8(+scales) KV.

The 4.5B e2e slope is ~0.9 s per mid layer; kernel rates predict ~0.25-0.45.
Suspect: the e4m3 KV cast-only dequant inside the kernel (Mosaic e4m3->bf16
converts measured slow on Wan too). If int8-KV (cheap column-scaling
dequant) wins big here, wiring a quantized MAGI window cache is the lever.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.kvcache.cache import quantize_kv_block
from inferix_tpu.ops.flash_attention import (flash_attention_gqa,
                                             flash_attention_prefix_quant)

N_ITER = 8
B, SQ, HQ, HKV, D = 1, 12150, 24, 8, 128   # one chunk's q; full window kv
SKV = 48600


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_ITER


def emit(**kw):
    line = json.dumps({"exp": "magi_attn", **{
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


key = jax.random.key(9)
q = jax.random.normal(key, (B, SQ, HQ, D), jnp.bfloat16)
k = jax.random.normal(key, (B, SKV, HKV, D), jnp.bfloat16) * 0.3
v = jax.random.normal(key, (B, SKV, HKV, D), jnp.bfloat16) * 0.3
kv_len = jnp.int32(SKV)
# effective FLOPs of the valid span (full window)
gf = 4 * SQ * SKV * HQ * D / 1e9


def chain(fn):
    @jax.jit
    def run(q, *kv):
        def body(c, _):
            o = fn(c, *kv)
            c2 = (o * jax.lax.rsqrt(
                jnp.mean(jnp.square(o.astype(jnp.float32))) + 1.0
            ).astype(o.dtype))
            return c2, None
        c, _ = jax.lax.scan(body, q, None, length=N_ITER)
        return c
    return run


# bf16 KV
t = timeit(chain(lambda c, kk, vv: flash_attention_gqa(c, kk, vv, kv_len)),
           q, k, v)
emit(kv="bf16", ms=t * 1e3, tfs=gf / t / 1e3)

# fp8 e4m3 KV (cast-only in-kernel dequant)
k8 = jnp.clip(k.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
v8 = jnp.clip(v.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
t = timeit(chain(lambda c, kk, vv: flash_attention_gqa(c, kk, vv, kv_len)),
           q, k8, v8)
emit(kv="fp8_e4m3", ms=t * 1e3, tfs=gf / t / 1e3)

# int8 KV + per-(token,head) scales, GQA folded manually
k_q, k_s = quantize_kv_block(k)
v_q, v_s = quantize_kv_block(v)
rep = HQ // HKV


def quant_call(c, kq, vq, ks, vs):
    qg = c.reshape(B, SQ, HKV, rep, D).transpose(0, 3, 1, 2, 4)
    qg = qg.reshape(B, rep * SQ, HKV, D)
    o = flash_attention_prefix_quant(qg, kq, vq, ks, vs, kv_len)
    o = o.reshape(B, rep, SQ, HKV, D).transpose(0, 2, 3, 1, 4)
    return o.reshape(B, SQ, HQ, D)


t = timeit(chain(quant_call), q, k_q, v_q, k_s, v_s)
emit(kv="int8_scales", ms=t * 1e3, tfs=gf / t / 1e3)
