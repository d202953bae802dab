"""Benchmark: Self-Forcing 1.3B semi-AR block generation, frames/s/chip.

Runs the full denoise loop (4 DMD steps + context re-run per 3-frame block)
at the reference geometry — latents [B=1, 21, 60x104, 16] @ 480x832
(`inferix/pipeline/self_forcing/pipeline.py:398`) — on one chip, NO_DECODE
path, in two configurations:
  * bf16 weights + bf16 KV cache (baseline)
  * int8 W8A8 weights (per-token act x per-channel weight) + int8 KV cache
    (the quantized serving path; v5e has no fp8 MXU so int8 is the
    low-precision compute format — fp8 weights are supported as a memory
    format and benchmark ~equal to bf16 compute)

vs_baseline compares the QUANTIZED path against the reference's stated
~500 ms per 3-frame block (=> 6 frames/s; BASELINE.md). Prints exactly one
JSON line.
"""
import json
import os
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


def run_config(cfg, params, dtype):
    """Returns (frames_per_s, time_to_first_block_s)."""
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    m, r = cfg.model, cfg.runtime
    gen = SemiARGenerator(cfg, params, dtype=dtype)
    context = jnp.zeros((r.batch_size, m.text_len, m.text_dim), dtype)
    xattn = gen.encode_text_context(context)
    fpb = m.num_frame_per_block
    noise_block = jax.random.normal(
        jax.random.key(1),
        (r.batch_size, fpb, r.latent_height, r.latent_width,
         r.latent_channels),
    ).astype(dtype)
    rng = jax.random.key(2)

    # warmup / compile — a FULL clip, not just block 0: span_grid buckets
    # (default ON since r5) give early blocks their own programs, which
    # must all be compiled before the timed regions. _sync(cache.k) as
    # well: with the split dispatch the context re-run is a SECOND program
    # that x0 does not depend on — timing regions must not start while a
    # previous region's re-run still occupies the chip, and the fps loop
    # must include the final block's re-run.
    num_blocks_warm = r.num_frames // fpb
    cache = gen.init_cache()
    wframe = 0
    for _ in range(num_blocks_warm):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise_block, sub, wframe)
        wframe += fpb
    _sync(x0)
    _sync(cache.k)

    # time-to-first-block (post-compile request start -> first block ready;
    # x0 alone — the re-run is pipelined behind the next block by design)
    cache = gen.init_cache()
    t0 = time.perf_counter()
    x0, cache = gen.denoise_block(cache, xattn, noise_block, rng, 0)
    _sync(x0)
    ttfb = time.perf_counter() - t0
    _sync(cache.k)

    num_blocks = r.num_frames // fpb
    cache = gen.init_cache()
    start = time.perf_counter()
    frame = 0
    for bi in range(num_blocks):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise_block, sub, frame)
        frame += fpb
    _sync(x0)
    _sync(cache.k)
    elapsed = time.perf_counter() - start
    return (num_blocks * fpb * r.batch_size) / elapsed, ttfb


def run_window_config(qparams) -> float:
    """Sustained frames/s in the rolling-window ring steady state."""
    import dataclasses

    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = _cfg()
    cfg.model.local_attn_size = 12
    cfg.model.sink_size = 1
    cfg.quant.enabled = True
    cfg.quant.dtype = "int8"
    cfg.quant.granularity = "per_channel"
    cfg.quant.quantize_kv_cache = True
    cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
    m, r = cfg.model, cfg.runtime
    gen = SemiARGenerator(cfg, qparams, dtype=jnp.bfloat16)
    xattn = gen.encode_text_context(
        jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16))
    fpb = m.num_frame_per_block
    noise = jax.random.normal(
        jax.random.key(1), (1, fpb, r.latent_height, r.latent_width,
                            r.latent_channels)).astype(jnp.bfloat16)
    rng = jax.random.key(2)
    cache = gen.init_cache()
    frame = 0
    for _ in range(6):  # fill the 13-frame window (+compile)
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
        frame += fpb
    _sync(x0)
    _sync(cache.k)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise, sub, frame)
        frame += fpb
    _sync(x0)
    _sync(cache.k)
    return n * fpb / (time.perf_counter() - t0)


# INFERIX_BENCH_FLAGS='{"fused_act_quant": true, ...}': apply quant/runtime
# field overrides to every config (A/B harness for default-flip decisions —
# the committed defaults stay the headline)
_FLAGS = json.loads(os.environ.get("INFERIX_BENCH_FLAGS", "{}"))


def _cfg():
    from inferix_tpu.core.config import EngineConfig

    c = EngineConfig()
    for k, v in _FLAGS.items():
        if hasattr(c.quant, k):
            setattr(c.quant, k, v)
        elif hasattr(c.runtime, k):
            setattr(c.runtime, k, v)
        else:
            raise ValueError(f"unknown bench flag {k!r}")
    return c


LAST_RESULT_PATH = "/root/repo/.bench_last.json"


def _backend_alive(timeout_s: float = 600.0) -> bool:
    """Probe the TPU backend in a SUBPROCESS with a hard timeout — axon
    backend init can hang indefinitely when the relay tunnel dies
    (round-2 postmortem: BENCH_r02 was empty because one init hang killed
    the whole record), and an in-process hang cannot be interrupted."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/root/repo/.jax_cache')\n"
        "import numpy as np, jax.numpy as jnp\n"
        "x = jnp.ones((128, 128), jnp.bfloat16)\n"
        "print(np.asarray(jax.device_get((x @ x)[0, 0])))\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_stale_or_die(reason: str) -> None:
    """Tunnel is down: degrade to the last warm-cache measurement with a
    stale marker instead of an empty record."""
    import os
    import sys

    if os.path.exists(LAST_RESULT_PATH):
        with open(LAST_RESULT_PATH) as f:
            rec = json.load(f)
        rec["stale"] = True
        rec["stale_reason"] = reason
        print(json.dumps(rec))
        return
    print(f"bench: TPU backend unavailable and no cached result "
          f"({reason})", flush=True)
    sys.exit(1)


def main() -> None:
    # backend liveness gate with retry/backoff BEFORE any in-process
    # jax.devices() call (which would hang unrecoverably on a dead tunnel)
    for attempt, wait_s in enumerate((0, 60, 180)):
        if wait_s:
            time.sleep(wait_s)
        if _backend_alive():
            break
        print(f"bench: backend probe {attempt + 1} failed", flush=True)
    else:
        _emit_stale_or_die("axon backend init unavailable after 3 probes")
        return

    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.quant.api import quantize_params

    cfg = _cfg()  # Wan 1.3B shapes, 21 frames, 3-frame blocks
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)

    bf16_fps, bf16_ttfb = run_config(cfg, params, jnp.bfloat16)

    # headline quant config: int8 W8A8 linears + bf16 KV COMPUTE. Measured
    # (exp/r2_results.jsonl attn_quant): int8-KV attention is SLOWER than
    # bf16 on v5e (7.11 vs 6.54 ms at full cache — dequant VPU tax exceeds
    # the int8-MXU gain), so the quantized KV cache is a CAPACITY feature
    # (half HBM -> 2 concurrent streams below), not a speed feature.
    qcfg = _cfg()
    qcfg.quant.enabled = True
    qcfg.quant.dtype = "int8"
    qcfg.quant.granularity = "per_channel"
    qcfg.quant.quantize_kv_cache = False
    qparams = quantize_params(params, qcfg.quant)
    int8_fps, int8_ttfb = run_config(qcfg, qparams, jnp.bfloat16)

    # serving throughput: 2 concurrent streams (continuous batching), int8 KV
    # halves per-stream cache so both fit alongside the weights. Drop the
    # bf16 weights first — holding them alongside the B=2 working set
    # exhausts the 16 GB chip.
    import gc

    del params
    gc.collect()
    q2cfg = _cfg()
    q2cfg.quant.enabled = True
    q2cfg.quant.dtype = "int8"
    q2cfg.quant.granularity = "per_channel"
    q2cfg.quant.quantize_kv_cache = True
    q2cfg.runtime.batch_size = 2
    int8_b2_fps, _ = run_config(q2cfg, qparams, jnp.bfloat16)

    # fast-context serving mode (context_mode='last_step'): the final denoise
    # step persists its KV and the clean-context re-run is skipped — 4
    # forwards/block instead of 5. Opt-in (slightly noisier context KV;
    # quality delta measured by bench_quality.py), reported alongside the
    # reference-semantics headline.
    fcfg = _cfg()
    fcfg.quant.enabled = True
    fcfg.quant.dtype = "int8"
    fcfg.quant.granularity = "per_channel"
    fcfg.quant.quantize_kv_cache = False
    fcfg.runtime.context_mode = "last_step"
    fast_fps, fast_ttfb = run_config(fcfg, qparams, jnp.bfloat16)

    # long-video serving point: rolling window (12 frames + 1 sink frame)
    # + int8 linears + int8 KV + fast context, measured in the ring steady
    # state (warm past the window fill, then time sustained blocks)
    window_fps = run_window_config(qparams)

    record = {
        "metric": "frames_per_s_per_chip_self_forcing_1p3b_w8a8",
        "value": round(int8_fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(int8_fps / REFERENCE_FRAMES_PER_S, 3),
        "bf16_frames_per_s": round(bf16_fps, 3),
        "quant_speedup_vs_bf16": round(int8_fps / bf16_fps, 3),
        "p50_time_to_first_block_s": round(int8_ttfb, 3),
        "bf16_time_to_first_block_s": round(bf16_ttfb, 3),
        "int8_batch2_total_frames_per_s": round(int8_b2_fps, 3),
        "int8_fast_context_frames_per_s": round(fast_fps, 3),
        "fast_context_time_to_first_block_s": round(fast_ttfb, 3),
        "int8_rolling_window_sustained_frames_per_s": round(window_fps, 3),
    }
    try:
        with open(LAST_RESULT_PATH, "w") as f:
            json.dump(record, f)
    except OSError:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
