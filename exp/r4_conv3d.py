"""Is XLA's 3D convolution the VAE decode bottleneck on v5e?

decode measured 1589 ms/latent-frame (~5.6 TF/s effective) — 30x off the
MXU rate. Compares, at the decoder's finest-level shape
[1, 4, 480, 832, 96] with a 3x3x3 kernel:
  A. conv_general_dilated NDHWC (current implementation)
  B. temporal decomposition: sum_dt conv2d(x[t+dt], w[dt]) with the frame
     axis folded into batch — pure 2D NHWC convs, which XLA tiles well
  C. kt folded into input channels (im2col over time): one 2D conv with
     cin = kt * C
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

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
    line = json.dumps({"exp": "conv3d", **{
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


B, T, H, W, C = 1, 4, 480, 832, 96
KT = 3
key = jax.random.key(3)
x = jax.random.normal(key, (B, T + KT - 1, H, W, C), jnp.bfloat16)  # padded
w = jax.random.normal(key, (KT, 3, 3, C, C), jnp.bfloat16) * 0.05
gf = 2 * B * T * H * W * C * C * KT * 9 / 1e9


@jax.jit
def conv_a(x, w):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        c2 = jnp.concatenate(
            [c[:, :KT - 1], (y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1.0
            ).astype(y.dtype))], axis=1)
        return c2, None
    c, _ = jax.lax.scan(body, x, None, length=N_ITER)
    return c


@jax.jit
def conv_b(x, w):
    def one(c):
        acc = None
        for dt in range(KT):
            xt = c[:, dt:dt + T].reshape(B * T, H, W, C)
            y = jax.lax.conv_general_dilated(
                xt, w[dt], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        return acc.reshape(B, T, H, W, C)

    def body(c, _):
        y = one(c)
        c2 = jnp.concatenate(
            [c[:, :KT - 1], (y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1.0
            ).astype(y.dtype))], axis=1)
        return c2, None
    c, _ = jax.lax.scan(body, x, None, length=N_ITER)
    return c


@jax.jit
def conv_c(x, w):
    wc = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, KT * C, C)

    def one(c):
        # stack kt shifted views onto channels: [B*T, H, W, KT*C]
        xt = jnp.concatenate([c[:, dt:dt + T] for dt in range(KT)], axis=-1)
        y = jax.lax.conv_general_dilated(
            xt.reshape(B * T, H, W, KT * C), wc, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(B, T, H, W, C)

    def body(c, _):
        y = one(c)
        c2 = jnp.concatenate(
            [c[:, :KT - 1], (y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1.0
            ).astype(y.dtype))], axis=1)
        return c2, None
    c, _ = jax.lax.scan(body, x, None, length=N_ITER)
    return c


for name, fn in [("3d_ndhwc", conv_a), ("2d_sum_dt", conv_b),
                 ("2d_ktchan", conv_c)]:
    t = timeit(fn, x, w)
    emit(variant=name, ms=t * 1e3, tfs=gf / t / 1e3)
