"""TRUE_STREAMING sustained serving rate on one v5e: rolling-window
generation (12-frame window + sink, int8 linears + int8 KV, fast context)
interleaved with whole-block VAE decode — the complete latents->pixels
serving loop, everything on the one chip.

Theoretical from parts: 12 pixel frames / (0.85 gen + 0.758 decode) s.
This measures the real interleaved loop (shared-chip scheduling included).
"""
import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.models.wan.vae import (
    CausalVAE, VAEConfig, set_vae_conv_impl, set_vae_upsample_impl)
from inferix_tpu.pipeline.semi_ar import SemiARGenerator
from inferix_tpu.quant.api import quantize_params

# VAE_CONV=halo_w8a8: the int8-conv decode serving mode (quality-gated in
# QUALITY_r05; -28% decode vs the lossless default)
import os as _os
_IMPL = _os.environ.get("VAE_CONV", "xla")
set_vae_conv_impl(_IMPL)
# VAE_UPSAMPLE=phase: the low-res 2x2 phase-conv upsample A/B
_UPS = _os.environ.get("VAE_UPSAMPLE", "repeat")
set_vae_upsample_impl(_UPS)


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = EngineConfig()
cfg.model.local_attn_size = 12
cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = True
cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
m, r = cfg.model, cfg.runtime

params = quantize_params(
    init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
vae = CausalVAE(VAEConfig(), key=jax.random.key(3), dtype=jnp.bfloat16)
vae.params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    vae.params)

xattn = gen.encode_text_context(
    jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16))
fpb = m.num_frame_per_block
noise = jax.random.normal(
    jax.random.key(1), (1, fpb, r.latent_height, r.latent_width,
                        r.latent_channels)).astype(jnp.bfloat16)
rng = jax.random.key(2)

# warm: fill window + compile both gen programs and both decode programs
cache = gen.init_cache()
dcache, first = None, True
frame = 0
for _ in range(6):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    px, dcache = vae.decode_chunk(x0, dcache, first=first)
    first = False
    frame += fpb
_sync(px)
_sync(cache.k)

n = 10
pixel_frames = 0
t0 = time.perf_counter()
for _ in range(n):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    px, dcache = vae.decode_chunk(x0, dcache, first=False)
    pixel_frames += px.shape[1]
    frame += fpb
_sync(px)
_sync(cache.k)
dt = time.perf_counter() - t0

line = json.dumps({
    "exp": "true_streaming_e2e", "conv_impl": _IMPL, "upsample_impl": _UPS,
    "window_frames": 12, "sink_frames": 1,
    "pixel_frames_per_s": round(pixel_frames / dt, 3),
    "latent_frames_per_s": round(n * fpb / dt, 3),
    "s_per_block_wall": round(dt / n, 3),
    "finite": bool(np.isfinite(np.asarray(
        jax.device_get(px[0, 0, :2, :2, 0]))).all()),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
