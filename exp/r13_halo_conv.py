"""Halo-block Pallas conv vs XLA conv at the VAE decode's hot shapes —
AMORTIZED protocol.

Round-4 discovery: the axon tunnel has a ~25 ms dispatch+fetch round-trip
floor (a jitted x+1 on [8,128] and a 512 MB elementwise both time ~25.5 ms).
Every per-op probe that timed ONE dispatch per rep (r12_vae_conv, r4 vae
stage numbers) measured the tunnel, not the op — which is why three
structurally different halo kernels all landed within 2% of XLA. This probe
chains ITERS conv applications inside one jit (output fed back as input, so
nothing can be hoisted) and divides by ITERS.
"""
import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from inferix_tpu.ops.halo_conv import halo_conv3d  # noqa: E402

ITERS = 20

SHAPES = [  # (name, tin, h, w, cin, cout, kt) — from exp/vae_stages.log
    ("res_L3", 6, 480, 832, 96, 96, 3),
    ("res_L2", 6, 240, 416, 192, 192, 3),
    ("up2d_conv", 4, 480, 832, 96, 48, 1),
    ("res_L1b", 4, 120, 208, 384, 384, 3),
]


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def _reexpand(out, tin, cin):
    """Map [t_out, h, w, cout] back to [tin, h, w, cin] so the conv chains
    (identical for both variants, so its cost subtracts out in the A/B)."""
    t_out = out.shape[0]
    cout = out.shape[-1]
    if cout != cin:
        reps = -(-cin // cout)
        out = jnp.tile(out, (1, 1, 1, reps))[..., :cin]
    if t_out != tin:
        out = jnp.concatenate([out[: tin - t_out], out], axis=0)
    return out * 0.05  # keep magnitudes bounded over the chain


def chained(conv, tin, cin, iters=ITERS):
    def step(i, x):
        return _reexpand(conv(x), tin, cin)
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, step, x)
    return run


def timeit(fn, x, reps=3):
    out = fn(x)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / ITERS, out


rng = np.random.default_rng(0)
for name, tin, h, wdim, cin, cout, kt in SHAPES:
    x = jnp.asarray(rng.standard_normal((tin, h, wdim, cin)) * 0.1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((kt, 3, 3, cin, cout)) * 0.05,
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.bfloat16)
    t_out = tin - (kt - 1)
    flops = 2 * t_out * h * wdim * cin * cout * kt * 9

    def xla_conv(xx, w=w, b=b):
        return jax.lax.conv_general_dilated(
            xx[None], w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b

    halo = functools.partial(halo_conv3d, w=w, b=b)
    for vname, conv in [("xla", xla_conv),
                        ("halo", lambda xx: halo_conv3d(xx, w, b))]:
        try:
            ms, _ = timeit(chained(conv, tin, cin), x)
            rec = {"exp": "r13v2", "shape": name, "variant": vname,
                   "iters": ITERS, "ms_per_conv": round(ms, 3),
                   "tfs": round(flops / (ms / 1e3) / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            rec = {"exp": "r13v2", "shape": name, "variant": vname,
                   "error": str(e)[:300]}
        print(json.dumps(rec), flush=True)
    # correctness at this shape (one dispatch; tolerance, not timing)
    a = xla_conv(x).astype(jnp.float32)
    hh = halo_conv3d(x, w, b).astype(jnp.float32)
    print(json.dumps({"exp": "r13v2", "shape": name,
                      "maxdiff": float(jnp.abs(a - hh).max())}), flush=True)
