"""Stage-wise VAE decoder timing on one v5e — reconstruct where the
measured 1589 ms/latent-frame goes (expected ~450 ms from the conv
microbench rates).

Times each decoder stage shape as its own jitted program:
  res blocks at every (resolution, channels, T) the decoder visits,
  attn at the latent grid, upsample resamples, the head norm+conv.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.models.wan.vae import (_CacheCtx, attn_block,
                                        init_attn_block, init_res_block,
                                        init_resample, res_block, resample)

N_ITER = 8


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
    line = json.dumps({"exp": "vae_stage", **{
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


key = jax.random.key(0)


def run_res(t, h, w, cin, cout, label):
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     init_res_block(key, cin, cout))
    x = jax.random.normal(key, (1, t, h, w, cin), jnp.bfloat16)

    @jax.jit
    def f(x, p):
        def body(c, _):
            ctx = _CacheCtx(None, first=False)
            y = res_block(p, c, ctx)
            y = y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1.0
            ).astype(y.dtype)
            return (y if cin == cout else c), None
        c, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return c

    t_ = timeit(f, x, p)
    emit(stage=f"res_{label}", shape=[t, h, w, cin, cout], ms=t_ * 1e3)


def run_attn(t, h, w, c):
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     init_attn_block(key, c))
    x = jax.random.normal(key, (1, t, h, w, c), jnp.bfloat16)

    @jax.jit
    def f(x, p):
        def body(cc, _):
            y = attn_block(p, cc)
            y = y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1.0
            ).astype(y.dtype)
            return y, None
        cc, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return cc

    t_ = timeit(f, x, p)
    emit(stage="attn", shape=[t, h, w, c], ms=t_ * 1e3)


def run_resample(t, h, w, c, mode):
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     init_resample(key, c, mode))
    x = jax.random.normal(key, (1, t, h, w, c), jnp.bfloat16)

    @jax.jit
    def f(x, p):
        def body(cc, _):
            ctx = _CacheCtx(None, first=False)
            y = resample(p, cc, ctx, mode)
            # feed something shape-compatible back
            s = jnp.mean(jnp.square(y.astype(jnp.float32)))
            return cc * (1.0 + s.astype(cc.dtype) * 1e-20), None
        cc, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return cc

    t_ = timeit(f, x, p)
    emit(stage=f"resample_{mode}", shape=[t, h, w, c], ms=t_ * 1e3)


# decoder walk for ONE latent frame (steady state), Wan 1.3B geometry:
# L0 60x104@384 T=1 (conv1 + mid 2res+attn + 3 res)
run_res(1, 60, 104, 384, 384, "L0")
run_attn(1, 60, 104, 384)
run_resample(1, 60, 104, 384, "upsample3d")      # -> T=2, 120x208@192
run_res(2, 120, 208, 192, 384, "L1a")
run_res(2, 120, 208, 384, 384, "L1b")
run_resample(2, 120, 208, 384, "upsample3d")     # -> T=4, 240x416@192
run_res(4, 240, 416, 192, 192, "L2")
run_resample(4, 240, 416, 192, "upsample2d")     # -> 480x832@96
run_res(4, 480, 832, 96, 96, "L3")
