"""Dead-grid-step overhead of the span kernel (MAGI serving suspect).

The prefix/span kernel's grid covers the FULL padded cache (n_kv =
Skv/kv_block steps); steps outside [kv_start, kv_len) skip both the DMA
(clamped index map) and the compute (@pl.when), but each still pays the
Pallas grid-sequencer cost. At the MAGI 4.5B window shape the cache is ~9
chunks while early chunks attend 1-2 — if a dead step costs ~1 us, the
dead steps could explain part of the measured ~0.9 s/layer vs the
~0.25 s kernel-rate prediction (BASELINE.md).

Measures, at the 4.5B geometry: full-span kernel time vs tiny-span time
on the SAME cache shape, vs tiny-span time on a TRIMMED cache (the
compile-per-span alternative). If (tiny-span, full cache) >> (tiny-span,
trimmed cache), dead steps are real cost and a span-sized-grid variant
(recompile per window position, ~10 programs/walk) pays for itself.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from inferix_tpu.ops.flash_attention import flash_attention_gqa


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def wan_case():
    """Wan 1.3B early-block geometry: q = one 3-frame block (4680 tokens),
    cache = full 21-frame clip (32760), live prefix = 1 block. The
    dead-step cost here is what RuntimeConfig.span_grid buys back at TTFB
    and over the first half of the clip."""
    b, h, d = 1, 12, 128
    bt, smax = 4680, 32760
    key = jax.random.key(3)
    q = jax.random.normal(key, (b, bt, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1),
                          (b, smax, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2),
                          (b, smax, h, d), jnp.bfloat16)
    f = jax.jit(lambda q, k, v, n: flash_attention_gqa(
        q, k, v, kv_len=n, kv_start=0))
    f_span = jax.jit(lambda q, k, v, n: flash_attention_gqa(
        q, k, v, kv_len=n, kv_start=0, max_span=bt))
    t_full = bench(f, q, k, v, jnp.int32(smax))
    t_tiny = bench(f, q, k, v, jnp.int32(bt))
    t_trim = bench(f, q, k[:, :bt], v[:, :bt], jnp.int32(bt))
    t_span = bench(f_span, q, k, v, jnp.int32(bt))
    print({"case": "wan_1.3b_block0", "full_ms": round(t_full, 3),
           "tiny_full_cache_ms": round(t_tiny, 3),
           "tiny_trimmed_ms": round(t_trim, 3),
           "tiny_max_span_ms": round(t_span, 3),
           "dead_grid_overhead_ms": round(t_tiny - t_trim, 3)}, flush=True)


def main():
    # 4.5B window geometry: ct=12150, window 3 denoising chunks, cache 9 chunks
    ct = 12160  # rounded to 128
    b, hq, hkv, d = 2, 24, 8, 128
    sq = 3 * ct
    for max_chunks in (9,):
        skv = max_chunks * ct
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, sq, hq, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (b, skv, hkv, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2),
                              (b, skv, hkv, d), jnp.bfloat16)
        f = jax.jit(lambda q, k, v, n: flash_attention_gqa(
            q, k, v, kv_len=n, kv_start=0))
        # the shipped fix (flash_attention max_span): span-sized grid
        # REMAPPED onto the full cache buffer — no trim copy, no dead steps
        f_span = jax.jit(lambda q, k, v, n: flash_attention_gqa(
            q, k, v, kv_len=n, kv_start=0, max_span=ct))

        t_full = bench(f, q, k, v, jnp.int32(skv))
        t_tiny = bench(f, q, k, v, jnp.int32(ct))
        # trimmed cache: emulates the ideal (copies the slice — not shippable)
        t_trim = bench(f, q, k[:, :ct], v[:, :ct], jnp.int32(ct))
        t_span = bench(f_span, q, k, v, jnp.int32(ct))
        dead = t_tiny - t_trim
        print({
            "skv": skv, "full_span_ms": round(t_full, 2),
            "tiny_span_full_cache_ms": round(t_tiny, 2),
            "tiny_span_trimmed_cache_ms": round(t_trim, 2),
            "tiny_span_max_span_grid_ms": round(t_span, 2),
            "dead_grid_overhead_ms": round(dead, 2),
            "dead_steps": (skv - ct) // 2048 * (b * hkv),
        }, flush=True)


if __name__ == "__main__":
    main()
    wan_case()
