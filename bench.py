"""Benchmark: Self-Forcing 1.3B semi-AR block generation, frames/s/chip.

Runs the full denoise loop (4 DMD steps + context re-run per 3-frame block)
at the reference geometry — latents [B=1, 21, 60x104, 16] @ 480x832
(`inferix/pipeline/self_forcing/pipeline.py:398`) — in bf16 on one chip,
NO_DECODE path, and reports steady-state frames/s.

vs_baseline compares against the reference's stated ~500 ms per 3-frame block
(=> 6 frames/s; `pipeline/self_forcing/pipeline.py:577` docstring, BASELINE.md).

Prints exactly one JSON line.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np


REFERENCE_FRAMES_PER_S = 6.0  # ~500 ms / 3-frame block (BASELINE.md)


def _sync(x) -> None:
    """Force completion with a host readback — on the axon relay,
    block_until_ready returns before the computation finishes."""
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main() -> None:
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = EngineConfig()  # Wan 1.3B shapes, 21 frames, 3-frame blocks
    m, r = cfg.model, cfg.runtime

    params = init_params(jax.random.key(0), m, dtype=jnp.bfloat16)
    gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)

    context = jnp.zeros((r.batch_size, m.text_len, m.text_dim), jnp.bfloat16)
    xattn = gen.encode_text_context(context)
    fpb = m.num_frame_per_block
    noise_block = jax.random.normal(
        jax.random.key(1),
        (r.batch_size, fpb, r.latent_height, r.latent_width,
         r.latent_channels),
    ).astype(jnp.bfloat16)
    rng = jax.random.key(2)

    # Warmup: compile + fill cache a bit
    cache = gen.init_cache()
    x0, cache = gen.denoise_block(cache, xattn, noise_block, rng, 0)
    _sync(x0)

    # Steady state: generate a full 21-frame clip's worth of blocks with the
    # cache progressively filling (block 7 attends to the full 32760-token
    # window — the realistic mix).
    num_blocks = r.num_frames // fpb
    cache = gen.init_cache()
    start = time.perf_counter()
    frame = 0
    for bi in range(num_blocks):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise_block, sub, frame)
        frame += fpb
    _sync(x0)
    elapsed = time.perf_counter() - start

    frames_per_s = (num_blocks * fpb * r.batch_size) / elapsed
    print(json.dumps({
        "metric": "frames_per_s_per_chip_self_forcing_1p3b_bf16",
        "value": round(frames_per_s, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_s / REFERENCE_FRAMES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
