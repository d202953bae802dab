"""Multi-tenant TRUE_STREAMING: 2 concurrent rolling-window sessions on one
v5e, each getting pixels — batched generation (B=2 rows are independent
streams over per-stream window caches) + per-stream PER_BLOCK VAE decode
(decode dispatches stay T=3 per stream: a single T=6-equivalent decode
working set exceeds one chip, q3_decode_w8a8_t6.log).

Expected from parts (attention-bound gen scales with B, decode serializes):
24 pixel frames / (B2-gen ~1.7 + 2 x decode) — batching buys CAPACITY
(2 sessions/chip with pixels) at roughly flat total throughput; this
measures the real number. VAE_CONV=halo_w8a8 for the serving decode mode.
"""
import dataclasses
import json
import os
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

_IMPL = os.environ.get("VAE_CONV", "halo_w8a8")
set_vae_conv_impl(_IMPL)
set_vae_upsample_impl(os.environ.get("VAE_UPSAMPLE", "repeat"))

B = int(os.environ.get("STREAMS", "2"))

cfg = EngineConfig()
cfg.model.local_attn_size = 12
cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = True
cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step",
                                  batch_size=B)
m, r = cfg.model, cfg.runtime

params = quantize_params(
    init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
vae = CausalVAE(VAEConfig(), key=jax.random.key(3), dtype=jnp.bfloat16)
vae.params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    vae.params)

xattn = gen.encode_text_context(
    jnp.zeros((B, m.text_len, m.text_dim), jnp.bfloat16))
fpb = m.num_frame_per_block
noise = jax.random.normal(
    jax.random.key(1), (B, fpb, r.latent_height, r.latent_width,
                        r.latent_channels)).astype(jnp.bfloat16)
rng = jax.random.key(2)

cache = gen.init_cache()
dcaches = [None] * B
first = True
frame = 0
for _ in range(6):  # warm: fill windows + compile gen and decode programs
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    for i in range(B):
        px, dcaches[i] = vae.decode_chunk(x0[i:i + 1], dcaches[i],
                                          first=first)
    first = False
    frame += fpb
jax.block_until_ready(px)

n = 10
pixel_frames = 0
t0 = time.perf_counter()
for _ in range(n):
    rng, sub = jax.random.split(rng)
    x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
    for i in range(B):
        px, dcaches[i] = vae.decode_chunk(x0[i:i + 1], dcaches[i],
                                          first=False)
        pixel_frames += int(px.shape[1])
    frame += fpb
jax.block_until_ready(px)
dt = time.perf_counter() - t0

line = json.dumps({
    "exp": "multitenant_true_streaming", "streams": B, "conv_impl": _IMPL,
    "window_frames": 12, "sink_frames": 1,
    "total_pixel_frames_per_s": round(pixel_frames / dt, 3),
    "per_stream_pixel_frames_per_s": round(pixel_frames / dt / B, 3),
    "s_per_block_round": round(dt / n, 3),
    "finite": bool(np.isfinite(np.asarray(
        jax.device_get(px[0, 0, :2, :2, 0]))).all()),
})
print(line, flush=True)
with open("/root/repo/exp/r2_results.jsonl", "a") as f:
    f.write(line + "\n")
