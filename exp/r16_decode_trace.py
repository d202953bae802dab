"""Op-level time attribution for the steady-state whole-chunk VAE decode.

The interleaved TRUE_STREAMING wall at HEAD is 1.561 s/block of which the
generator explains ~0.81 s — decode is ~0.75 s/block and the xla-vs-halo
whole-decode A/B came back IDENTICAL (757.6 vs 757.5 ms), meaning the
3x3x3 convs the halo kernel accelerates are NOT the bound at the program
level. This traces 8 warm steady-state `decode_chunk` dispatches and sums
device-plane op self-times so the next decode lever targets real cost.

Usage: python exp/r16_decode_trace.py [halo|xla]
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")

from r6_op_breakdown import parse_xplane  # noqa: E402

from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig, set_vae_conv_impl

IMPL = sys.argv[1] if len(sys.argv) > 1 else "xla"
set_vae_conv_impl(IMPL)
TRACE_DIR = f"/tmp/r16_trace_{IMPL}"


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


vae = CausalVAE(VAEConfig(), key=jax.random.key(0), dtype=jnp.bfloat16)
vae.params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    vae.params)

z = jax.random.normal(jax.random.key(1), (1, 3, 60, 104, 16), jnp.bfloat16)
out, cache = vae.decode_chunk(z, None, first=True)
_sync(out)
out, cache = vae.decode_chunk(z, cache, first=False)
_sync(out)

n = 8
t0 = time.perf_counter()
with jax.profiler.trace(TRACE_DIR):
    for _ in range(n):
        out, cache = vae.decode_chunk(z, cache, first=False)
    _sync(out)
wall = (time.perf_counter() - t0) / n
print(json.dumps({"exp": "r16", "impl": IMPL,
                  "ms_per_chunk_wall": round(wall * 1e3, 1)}), flush=True)

rows = parse_xplane(TRACE_DIR, top=48)
acc = 0.0
for r in rows:
    if "op" not in r:
        print(json.dumps(r), flush=True)
        continue
    acc += r["ms_total"]
    print(json.dumps({"op": r["op"],
                      "ms_per_chunk": round(r["ms_total"] / n, 2)}),
          flush=True)
print(json.dumps({"exp": "r16", "impl": IMPL,
                  "sum_top48_ms_per_chunk": round(acc / n, 1)}), flush=True)
