"""On-chip streaming VAE decode throughput (the piece every frames/s number
so far excludes — NO_DECODE measured the generator alone).

Measures the cached per-latent-frame decode at the reference resolution
(60x104 latents -> 480x832 pixels, temporal factor 4) in bf16, and derives
the combined generate+decode serving rate for the rolling-window config
(0.91 s per 3-latent-frame block): both run on the one chip, so steady
state is additive unless decode is offloaded.

Reference context: TRUE_STREAMING budgets ~7.7 GB for VAE decode next to
~8.4 GB generator (`inferix/pipeline/self_forcing/pipeline.py:510-523`).

Usage: python exp/r4_vae_decode.py
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.models.wan.vae import (
    CausalVAE, VAEConfig, set_vae_conv_impl, set_vae_upsample_impl)

# VAE_CONV=shifted_matmul: the MXU conv formulation A/B (exp/r12_vae_conv.py)
import os as _os
_IMPL = _os.environ.get("VAE_CONV", "xla")
set_vae_conv_impl(_IMPL)
# VAE_UPSAMPLE=phase: the low-res 2x2 phase-conv upsample A/B
_UPS = _os.environ.get("VAE_UPSAMPLE", "repeat")
set_vae_upsample_impl(_UPS)


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


vae = CausalVAE(VAEConfig(), key=jax.random.key(0), dtype=jnp.bfloat16)
vae.params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    vae.params)

B, H, W, Z = 1, 60, 104, 16
T = int(sys.argv[1]) if len(sys.argv) > 1 else 3  # latent frames per dispatch
z = jax.random.normal(jax.random.key(1), (B, T, H, W, Z), jnp.bfloat16)

# first-block program (temporal caches empty)
out, cache = vae.decode_chunk(z, None, first=True)
_sync(out)
# steady-state program
out, cache = vae.decode_chunk(z, cache, first=False)
_sync(out)

n = 8
t0 = time.perf_counter()
for _ in range(n):
    out, cache = vae.decode_chunk(z, cache, first=False)
_sync(out)
dt = (time.perf_counter() - t0) / n
pix_frames = out.shape[1]  # 4T pixel frames per steady-state chunk

gen_s_per_block = 0.91          # rolling-window int8+fast-context (BASELINE)
blocks_per_chunk = T / 3
combined = pix_frames / (gen_s_per_block * blocks_per_chunk + dt)

line = json.dumps({
    "exp": "vae_decode_480x832_bf16", "conv_impl": _IMPL,
    "upsample_impl": _UPS,
    "latent_frames_per_dispatch": T,
    "ms_per_chunk": round(dt * 1e3, 1),
    "ms_per_latent_frame": round(dt * 1e3 / T, 1),
    "decode_pixel_frames_per_s": round(pix_frames / dt, 2),
    "combined_gen_plus_decode_pixel_fps": round(combined, 2),
    "finite": bool(np.isfinite(np.asarray(
        jax.device_get(out[0, 0, :2, :2, 0]))).all()),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
