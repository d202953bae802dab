"""Cache-layout A/B: [L,B,S,H,D] (current) vs head-major [L,B,H,S,D].

Perf-floor chase (VERDICT weak#1, the ~39 ms/forward non-matmul residue):
the flash kernels fold operands to [B*H, S, D], and with the token-major
cache that fold is a PHYSICAL TRANSPOSE of the full per-layer cache slice
— an XLA copy pallas_call operands can't fuse away (exp/alias_probe.log
shows the `%copy ... transpose` pairs). At the Wan 1.3B serving shape the
k+v slices are 2 x 100 MB/layer; a transpose is read+write, so ~12 GB of
HBM traffic per 30-layer forward (~15 ms at v5e's ~819 GB/s) IF nothing
overlaps. Head-major storage makes the fold a free reshape and moves the
transpose to the written block (2 x 14 MB/layer — 14x less).

Two probes, bf16 full cache, Wan 1.3B geometry:
  scan   — 30-layer lax.scan mimicking the engine's write->attend loop,
           cache donated, both layouts. The honest e2e proxy.
  kernel — isolated single-layer attention incl. the fold, both layouts.

Prints one JSON line per measurement. Run on the real chip.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from inferix_tpu.ops.flash_attention import flash_attention_prefix

L, B, H, D = 30, 1, 12, 128
SQ, SKV = 4680, 32760
DTYPE = jnp.bfloat16
INTERPRET = False  # set True for CPU smoke tests


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def bench(fn, args, iters=20, donate=()):
    # donation: rebuild args each iter from kept host copies is too slow;
    # instead thread the donated caches through like the engine does
    out = fn(*args)
    if donate:
        args = list(args)
        for i, j in enumerate(donate):
            args[j] = out[i + 1]
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if donate:
            for i, j in enumerate(donate):
                args[j] = out[i + 1]
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_inputs(layout):
    key = jax.random.key(0)
    cshape = (L, B, H, SKV, D) if layout == "bhsd" else (L, B, SKV, H, D)
    ck = jax.random.normal(key, cshape, DTYPE)
    cv = jax.random.normal(jax.random.fold_in(key, 1), cshape, DTYPE)
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, SQ, H, D), DTYPE)
    nk = jax.random.normal(jax.random.fold_in(key, 3), (L, B, SQ, H, D), DTYPE)
    nv = jax.random.normal(jax.random.fold_in(key, 4), (L, B, SQ, H, D), DTYPE)
    return ck, cv, q, nk, nv


def scan_forward(layout):
    seq_axis = 2 if layout == "bhsd" else 1

    def body(carry, xs):
        q, start = carry
        k_l, v_l, nk_l, nv_l = xs
        if layout == "bhsd":
            nk_l = nk_l.transpose(0, 2, 1, 3)  # [B,n,H,D] -> [B,H,n,D]
            nv_l = nv_l.transpose(0, 2, 1, 3)
        zeros = [0] * k_l.ndim
        zeros[seq_axis] = start
        k_l = jax.lax.dynamic_update_slice(k_l, nk_l, tuple(zeros))
        v_l = jax.lax.dynamic_update_slice(v_l, nv_l, tuple(zeros))
        out = flash_attention_prefix(q, k_l, v_l, start + SQ,
                                     kv_layout=layout,
                                     interpret=INTERPRET)
        # feed the block output forward like the real layer stack does
        return (out.astype(DTYPE), start), (k_l, v_l)

    def fwd(ck, cv, q, nk, nv, start):
        (out, _), (ck2, cv2) = jax.lax.scan(
            body, (q, start), (ck, cv, nk, nv))
        return out, ck2, cv2

    return jax.jit(fwd, donate_argnums=(0, 1))


def run_scan(layout):
    ck, cv, q, nk, nv = make_inputs(layout)
    fwd = scan_forward(layout)
    start = jnp.int32(SKV - SQ)  # full-cache forward (the expensive ones)
    ms = bench(lambda ck, cv: fwd(ck, cv, q, nk, nv, start),
               [ck, cv], iters=10, donate=(0, 1))
    print(json.dumps({"case": f"scan30_{layout}", "ms": round(ms, 2),
                      "ms_per_layer": round(ms / L, 3)}), flush=True)
    return ms


def run_kernel(layout):
    ck, cv, q, _, _ = make_inputs(layout)
    k_l, v_l = ck[0], cv[0]
    f = jax.jit(lambda q, k, v: flash_attention_prefix(
        q, k, v, jnp.int32(SKV), kv_layout=layout, interpret=INTERPRET))
    out = f(q, k_l, v_l)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = f(q, k_l, v_l)
    _sync(out)
    ms = (time.perf_counter() - t0) / 30 * 1e3
    flops = 4 * B * H * SQ * SKV * D
    print(json.dumps({"case": f"kernel_{layout}", "ms": round(ms, 3),
                      "tf_s": round(flops / ms / 1e9, 1)}), flush=True)
    return ms


def run_engine(head_major, quant=True, span_grid=False):
    """The decision number: real 1.3B clip f/s via SemiARGenerator with
    RuntimeConfig.kv_head_major / span_grid toggled (same protocol as
    bench.py) — one queue run settles both default-OFF flags."""
    from bench import run_config
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.quant.api import quantize_params

    cfg = EngineConfig()
    cfg.runtime.kv_head_major = head_major
    cfg.runtime.span_grid = span_grid
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)
    if quant:
        cfg.quant.enabled = True
        params = quantize_params(params, cfg.quant)
    fps, ttfb = run_config(cfg, params, jnp.bfloat16)
    tag = "hm" if head_major else "tm"
    if span_grid:
        tag += "_span"
    print(json.dumps({"case": f"engine_{'int8' if quant else 'bf16'}_{tag}",
                      "frames_per_s": round(fps, 3),
                      "ttfb_s": round(ttfb, 3)}), flush=True)
    return fps


if __name__ == "__main__":
    for layout in ("bshd", "bhsd"):
        run_kernel(layout)
    for layout in ("bshd", "bhsd"):
        run_scan(layout)
    # engine A/Bs, cheapest-information-first: the int8 headline in all
    # four (head_major x span_grid) corners, then the bf16 layout pair
    for hm in (False, True):
        run_engine(hm, quant=True)
    for hm in (False, True):
        run_engine(hm, quant=True, span_grid=True)
    for hm in (False, True):
        run_engine(hm, quant=False)
