"""Op-level time attribution for the Wan full-cache forward (VERDICT
weak#1: 315 ms = 212 attention + 59 linears + ~39 "everything else" — name
the 39 ms so the fusion work targets real cost, not guesses).

Two modes:
  (default)   capture a jax.profiler trace around N warm forwards and
              parse the xplane for per-op self-time totals, grouped by
              fusion kind (run on the real chip; also works on CPU for
              plumbing validation).
  --ablate    monkeypatch the elementwise helpers (layer_norm, rms_norm,
              apply_rope, _modulate, _gate) to identities, recompile, and
              diff the step time — a direct measure of their
              un-overlapped cost (fusion interactions included).
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/r6_trace"


def build_step(quant: bool = True, tiny: bool = False, donate: bool = False,
               alloc_pad: bool = False):
    """One full-cache denoise forward at the 1.3B serving geometry
    (tiny=True: the unit-test config, for CPU plumbing validation)."""
    import functools

    from inferix_tpu.core.config import EngineConfig, tiny_test_config
    from inferix_tpu.kvcache.cache import init_kv_cache
    from inferix_tpu.models.wan.causal_dit import (
        dit_forward_inference, init_params, make_statics,
        precompute_crossattn_cache)
    from inferix_tpu.ops.rope import build_rope_tables
    from inferix_tpu.quant.api import quantize_params

    cfg = tiny_test_config() if tiny else EngineConfig()
    m, r = cfg.model, cfg.runtime
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = init_params(jax.random.key(0), m, dtype=dtype)
    if quant and not tiny:
        cfg.quant.enabled = True
        params = quantize_params(params, cfg.quant)
    fpb = m.num_frame_per_block
    # frames per dispatch = one block; the cache size comes from
    # cfg.attention_window_frames (the full 21-frame clip)
    statics = make_statics(m, 1, fpb, r.latent_height, r.latent_width, dtype,
                           kv_alloc_multiple=2048 if alloc_pad else 0)
    rope = build_rope_tables(m.head_dim, m.rope_max_seq_len)
    xattn = jax.jit(functools.partial(precompute_crossattn_cache, cfg=m))(
        params, context=jnp.zeros((1, m.text_len, m.text_dim), dtype))
    cache = init_kv_cache(statics.spec)
    x = jax.random.normal(jax.random.key(1),
                          (1, fpb, r.latent_height, r.latent_width,
                           r.latent_channels), dtype)
    t = jnp.full((1, fpb), 400.0, jnp.float32)
    # last block position: the full cache is live
    start = jnp.int32(statics.spec.max_tokens - statics.geo.tokens)
    # donate=True is the PRODUCTION configuration: the engine donates the
    # cache through every dispatch (verified in-place by the alias probe),
    # where the plain probe's non-donated jit makes XLA insert defensive
    # whole-cache copies (~18 ms/forward at this shape — %copy.62/63 in
    # op_breakdown.log). persist_kv=False threads the buffers through
    # unchanged, so re-passing the returned cache keeps the loop valid.
    fn = jax.jit(functools.partial(dit_forward_inference, statics=statics,
                                   persist_kv=False),
                 donate_argnames=("cache",) if donate else ())
    state = {"cache": cache}

    def step():
        out, state["cache"] = fn(params, rope_tables=rope, x=x, t=t,
                                 xattn=xattn, cache=state["cache"],
                                 current_start=start)
        return out

    return step


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timed(step, iters=10):
    _sync(step())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def trace_mode(iters: int, tiny: bool = False):
    step = build_step(tiny=tiny)
    base_ms = timed(step, iters)
    print(f"forward: {base_ms:.1f} ms")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            out = step()
        _sync(out)
    print("trace captured; parsing xplane…", flush=True)
    tot = parse_xplane(TRACE_DIR, top=40)
    print(json.dumps({"forward_ms": round(base_ms, 2),
                      "top_ops_ms_per_iter": tot}, indent=1))


# -- minimal pure-python xplane.pb walker (no tf/tbp version coupling) -----
# xplane.proto (tsl/profiler): XSpace{planes=1}, XPlane{name=2, lines=3,
# event_metadata=4 map<int64, XEventMetadata{id=1, name=2}>},
# XLine{name=2, events=4}, XEvent{metadata_id=1, offset_ps=2,
# duration_ps=3} — field numbers verified against a captured trace.

def _pb_fields(buf):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wt == 5:
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield field, wt, val


def _varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def parse_xplane(trace_dir: str, top: int = 40):
    """Group device-plane event durations by op name (ms per whole trace)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    with open(paths[-1], "rb") as f:
        space = f.read()
    totals = {}
    plane_names = []
    for fno, wt, plane in _pb_fields(space):
        if fno != 1:
            continue
        name, evmeta, lines = "", {}, []
        for f2, w2, v in _pb_fields(plane):
            if f2 == 2:
                name = v.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v)
            elif f2 == 4:  # map entry: key=1 varint, value=2 XEventMetadata
                k = nm = None
                for f3, w3, v3 in _pb_fields(v):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, w4, v4 in _pb_fields(v3):
                            if f4 == 2:
                                nm = v4.decode("utf-8", "replace")
                if k is not None:
                    evmeta[k] = nm or str(k)
        plane_names.append(name)
        low = name.lower()
        if not ("tpu" in low or "gpu" in low or "device" in low
                or "xla op" in low or "/host:cpu" in low):
            continue
        for line in lines:
            for f2, w2, v in _pb_fields(line):
                if f2 != 4:
                    continue
                mid = dur = 0
                for f3, w3, v3 in _pb_fields(v):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                nm = evmeta.get(mid, str(mid))
                totals[nm] = totals.get(nm, 0.0) + dur / 1e9
    if not totals:
        return [{"note": f"no device events; planes={plane_names}"}]
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [{"op": k[:110], "ms_total": round(v, 3)} for k, v in ranked]


def ablate_mode(iters: int, tiny: bool = False):
    import inferix_tpu.models.wan.causal_dit as cd

    import gc

    step = build_step(tiny=tiny)
    base = timed(step, iters)
    results = {"full_ms": round(base, 2)}
    print(json.dumps(results), flush=True)  # partial record survives OOM
    # drop the first build's params/cache/executable BEFORE building the
    # ablated one — holding both OOMs the 16 GB chip (r6_results/ablate.log)
    del step
    gc.collect()
    saved = {}

    def patch(name, fn):
        saved[name] = getattr(cd, name)
        setattr(cd, name, fn)

    try:
        patch("layer_norm", lambda x, *a, **k: x)
        patch("rms_norm", lambda x, w, eps: x)
        patch("apply_rope", lambda x, angles: x)
        patch("_modulate", lambda h, sh, sc, f: h)
        patch("_gate", lambda y, g, f: y)
        step2 = build_step(tiny=tiny)
        abl = timed(step2, iters)
        results["elementwise_nulled_ms"] = round(abl, 2)
        results["unoverlapped_elementwise_ms"] = round(base - abl, 2)
    finally:
        for k, v in saved.items():
            setattr(cd, k, v)
    print(json.dumps(results))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--donate", action="store_true",
                    help="donate the cache through the jit (the production "
                         "configuration — separates the plain probe's "
                         "defensive whole-cache copies from real cost)")
    ap.add_argument("--allocpad", action="store_true",
                    help="pad-free cache allocation (kv_alloc_pad)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="unit-test config on CPU (plumbing validation)")
    a = ap.parse_args()
    if a.tiny:
        jax.config.update("jax_platforms", "cpu")
    if a.ablate:
        ablate_mode(a.iters, tiny=a.tiny)
    elif a.donate or a.allocpad:
        step = build_step(tiny=a.tiny, donate=a.donate, alloc_pad=a.allocpad)
        ms = timed(step, a.iters)
        print(json.dumps({"case": "forward", "donate": a.donate,
                          "alloc_pad": a.allocpad, "ms": round(ms, 2)}))
    else:
        trace_mode(a.iters, tiny=a.tiny)
