"""VAE decode conv: is 41 TF/s XLA-conv speed-of-light on v5e? (VERDICT r3
item 5.)

Decode is conv-bound: 252.8 ms/latent-frame reconstructs from conv
primitive rates, the hottest being the finest-level 3x3x3 res convs at
[1, 4, 480, 832, 96] — 19.4 ms / 40.9 TF/s (exp/conv3d.log; 2D
decompositions measured WORSE). This probes whether the conv LOWERING is
the limit, not the arithmetic:

  A. conv_general_dilated NDHWC          (engine baseline)
  B. channel-pad 96->128 conv            (is the rate a C%128 padding tax?)
  C. shifted-matmul sum: y = sum_taps shift(x) @ W[tap] — 27 [M,96]x[96,96]
     MXU matmuls on slices of one padded x; no conv lowering at all.
     Bandwidth bound ~27 reads x 230 MB = 7.6 ms vs the 19.4 ms measured,
     so if conv lowering is the problem this wins ~2x.
  D. C with the 27 taps' weights concatenated: one [M*27... ] variant via
     einsum over a [3,3,3,96,128-pad] — skipped if C loses.

Whichever wins lands in models/wan/vae.py behind VAEConfig.conv_impl.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

T, H, W, C = 4, 480, 832, 96


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, T, H, W, C)) * 0.1, jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
flops = 2 * T * H * W * C * C * 27


@jax.jit
def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.jit
def conv3d_pad128(x, w):
    xp = jnp.pad(x, ((0, 0),) * 4 + ((0, 128 - C),))
    wp = jnp.pad(w, ((0, 0),) * 3 + ((0, 128 - C), (0, 128 - C)))
    return jax.lax.conv_general_dilated(
        xp, wp, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[..., :C]


@jax.jit
def shifted_matmul(x, w):
    # pad once; each tap is a [T,H,W] slice -> [M, C] matmul on the MXU
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((T * H * W, C), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, dt, dh, dw, 0), (1, T, H, W, C)
                ).reshape(T * H * W, C)
                acc = acc + jax.lax.dot_general(
                    xs, w[dt, dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    return acc.reshape(1, T, H, W, C).astype(x.dtype)


results = []
for name, fn in [("conv3d_ndhwc", conv3d), ("conv3d_pad128", conv3d_pad128),
                 ("shifted_matmul", shifted_matmul)]:
    try:
        ms, out = timeit(fn, x, w)
        rec = {"exp": "r12_vae_conv", "variant": name, "ms": round(ms, 2),
               "tfs": round(flops / (ms / 1e3) / 1e12, 1)}
    except Exception as e:
        rec = {"exp": "r12_vae_conv", "variant": name, "error": str(e)[:200]}
    results.append(rec)
    print(json.dumps(rec), flush=True)

# correctness cross-check of the winner formulations
a = np.asarray(conv3d(x, w), np.float32)
c = np.asarray(shifted_matmul(x, w), np.float32)
print(json.dumps({"exp": "r12_vae_conv", "check_maxdiff":
                  float(np.abs(a - c).max())}), flush=True)
