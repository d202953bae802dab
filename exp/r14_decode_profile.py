"""Amortized per-stage VAE decode cost model (tunnel-floor-proof).

The r4 stage table timed one dispatch per stage (invalid: ~25 ms tunnel
floor). This chains ITERS applications of each stage inside one jit at the
DECODE-REAL shapes (3-latent chunk at 480x832: finest level runs T=12) and
divides. Outputs the honest decode cost model that decides where the next
decode lever is (halo conv share vs norms vs upsample vs attn).
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from inferix_tpu.models.wan import vae as V  # noqa: E402
from inferix_tpu.ops.halo_conv import halo_conv3d, halo_conv3d_w8a8  # noqa: E402

ITERS = 10


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, x, reps=3):
    run = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    out = run(x)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / ITERS


rng = np.random.default_rng(0)
key = jax.random.key(0)


def rand(shape, scale=0.1):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)


# decode-real stage shapes for a 3-latent chunk (z [1,3,60,104,16]):
# middle+L0 at [3,60,104,384]; L1 at [6,120,208,384->192]; L2 at
# [12,240,416,192]; L3 at [12,480,832,96]
STAGES = []

def add_conv(name, t, h, w, cin, cout, kt):
    wt = rand((kt, 3, 3, cin, cout), 0.05)
    b = rand((cout,), 0.1)
    tin = t + kt - 1

    def xla(x):
        y = jax.lax.conv_general_dilated(
            x[None], wt, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b
        return jnp.concatenate([y[: tin - t] * 0.0, y], 0)[..., :cin] \
            if cin == cout else y
    # chainable only when cin == cout
    if cin == cout:
        def xla_c(x):
            y = jax.lax.conv_general_dilated(
                x[None], wt, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b
            return jnp.concatenate([y[:kt - 1], y], 0) * 0.05

        def halo_c(x):
            y = halo_conv3d(x, wt, b)
            return jnp.concatenate([y[:kt - 1], y], 0) * 0.05

        def halo8_c(x):
            y = halo_conv3d_w8a8(x, wt, b)
            return jnp.concatenate([y[:kt - 1], y], 0) * 0.05

        x0 = rand((tin, h, w, cin))
        STAGES.append((f"{name}_xla", xla_c, x0))
        STAGES.append((f"{name}_halo", halo_c, x0))
        STAGES.append((f"{name}_halo_w8a8", halo8_c, x0))


add_conv("conv_L3_96", 12, 480, 832, 96, 96, 3)
add_conv("conv_L2_192", 12, 240, 416, 192, 192, 3)
add_conv("conv_L1_384", 6, 120, 208, 384, 384, 3)
add_conv("conv_L0_384", 3, 60, 104, 384, 384, 3)

# elementwise / norm stages at the finest level
g96 = {"gamma": jnp.ones((96,), jnp.bfloat16)}
STAGES.append(("norm_silu_L3",
               lambda x: jax.nn.silu(V.rms_norm_spatial(g96, x)),
               rand((12, 480, 832, 96))))
STAGES.append(("upsample2d_repeat",
               lambda x: jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
               [:, :240, :416, :] * 0.5,
               rand((12, 240, 416, 192))))

# single-head spatial attention at the middle block shape
qkvw = rand((384, 384 * 3), 0.02)

def attn(x):
    bt, hw, c = x.shape
    qkv = (x @ qkvw).reshape(bt, hw, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return x + jnp.einsum("bqk,bkc->bqc", probs, v) * 0.05

STAGES.append(("attn_middle", attn, rand((3, 60 * 104, 384))))

for name, fn, x0 in STAGES:
    try:
        ms = timeit(fn, x0)
        rec = {"exp": "r14", "stage": name, "ms": round(ms, 2)}
    except Exception as e:  # noqa: BLE001
        rec = {"exp": "r14", "stage": name, "error": str(e)[:200]}
    print(json.dumps(rec), flush=True)
