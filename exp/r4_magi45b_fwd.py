"""MAGI-1 4.5B distill-quant (fp8) steady-state window forward on one v5e.

Reference workload (`example/magi/configs/4.5B/4.5B_distill_quant_config.json`):
720x720 -> latent 90x90, chunk_width 6 (12150 tokens/chunk), window 4
(48600-token window forward), num_steps 64 (=> 16 forwards per chunk),
cfg_number 1 (single conditional forward), fp8 per-tensor quantized middle
layers with bf16 first/last. Params are random but in the exact distill-quant
layout (w_q e4m3 + weight_scale + act_scale) so the fp8 dequant path is the
one measured.

Derives: s/forward -> s/chunk (16 forwards) -> pixel frames/s
(chunk = 6 latent frames x temporal factor 4 = 24 pixel frames).
"""
import json
import os
import sys
import time

import jax

TINY = os.environ.get("MAGI_TINY") == "1"
if TINY:  # CPU shape/tree smoke before paying the TPU compile
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import ml_dtypes
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.models.magi.dit import MagiModelConfig
from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


cfg = MagiModelConfig()  # defaults ARE the 4.5B geometry
H = W = 90               # 720/8 VAE latent
# MAGI_RES=<latent hw>: reduced geometry (e.g. 60 = 480x480) — the round-5
# knob that lets the BASE config (cfg_number=3, batch 2) fit one v5e so the
# cfg3-vs-distilled cost ratio can be MEASURED instead of predicted
# (VERDICT r4 item 2; full-size cfg3 per-chunk needs 18.93 GiB > 15.75)
if os.environ.get("MAGI_RES"):
    H = W = int(os.environ["MAGI_RES"])
# MAGI_WEIGHTS=fp8 (default: distill-quant e4m3 layout) | bf16 | int8
WEIGHTS = os.environ.get("MAGI_WEIGHTS", "fp8")
# MAGI_LAYERS=<n> shrinks the stack (diagnostics: isolates per-layer cost
# from whole-model HBM pressure); default is the real 34
if os.environ.get("MAGI_LAYERS"):
    import dataclasses as _dc

    cfg = _dc.replace(cfg, num_layers=int(os.environ["MAGI_LAYERS"]))
if TINY:
    cfg = MagiModelConfig(
        hidden_size=128, ffn_hidden_size=256, num_layers=4,
        num_attention_heads=4, num_query_groups=2, kv_channels=32,
        caption_channels=96, caption_max_length=16)
    H = W = 8
rng = np.random.default_rng(0)


def lin(i, o, bias=False, f32=False):
    dt = np.float32 if f32 else ml_dtypes.bfloat16
    p = {"w": jnp.asarray(
        (rng.standard_normal((i, o), np.float32) / np.sqrt(i)).astype(dt))}
    if bias:
        p["b"] = jnp.zeros((o,), jnp.float32 if f32 else jnp.bfloat16)
    return p


def fp8_lin(i, o):
    w = rng.standard_normal((i, o), np.float32) / np.sqrt(i)
    ws = np.abs(w).max() / 448.0
    return {
        "w_q": jnp.asarray((w / ws).astype(ml_dtypes.float8_e4m3fn)),
        "weight_scale": jnp.float32(ws),
        "act_scale": jnp.full((i,), 0.5, jnp.float32),
    }


def ln(n, f32=False):
    dt = jnp.float32 if f32 else jnp.bfloat16
    return {"w": jnp.zeros((n,), dt), "b": jnp.zeros((n,), dt)}


def block(quant):
    h, hd = cfg.hidden_size, cfg.kv_channels
    qd = cfg.num_attention_heads * hd
    kvd = cfg.num_query_groups * hd
    mk = fp8_lin if (quant and WEIGHTS != "bf16") else lin
    return {
        "ln_qkv": ln(h),
        "q": mk(h, qd), "qx": mk(h, qd), "k": mk(h, kvd), "v": mk(h, kvd),
        "q_ln": ln(hd), "qx_ln": ln(hd), "k_ln": ln(hd), "kx_ln": ln(hd),
        "kv_xattn": lin(cfg.xattn_dim, 2 * kvd),
        "proj": mk(2 * qd, h),
        "ada_proj": lin(cfg.cond_dim, 2 * h, bias=True, f32=True),
        "self_post_norm": ln(h, f32=True), "mlp_post_norm": ln(h, f32=True),
        "mlp_ln": ln(h),
        "fc1": mk(h, cfg.ffn_hidden_size), "fc2": mk(cfg.ffn_hidden_size, h),
    }


def stack(bs):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)


patch_in = cfg.t_patch_size * cfg.patch_size ** 2 * cfg.in_channels
patch_out = cfg.t_patch_size * cfg.patch_size ** 2 * cfg.out_channels
_cpu0 = jax.devices("cpu")[0]
_host = jax.default_device(_cpu0)  # build (and requantize) in host RAM
_host.__enter__()
params = {
    "x_embedder": lin(patch_in, cfg.hidden_size),
    "t_embedder": {"fc1": lin(256, cfg.cond_dim, bias=True, f32=True),
                   "fc2": lin(cfg.cond_dim, cfg.cond_dim, bias=True,
                              f32=True)},
    "y_embedder": {
        "y_proj_xattn": lin(cfg.caption_channels, cfg.xattn_dim, bias=True),
        "y_proj_adaln": lin(cfg.caption_channels, cfg.cond_dim, bias=True,
                            f32=True),
        "null_caption_embedding": jnp.asarray(
            (rng.standard_normal(
                (cfg.caption_max_length, cfg.caption_channels),
                np.float32) * 0.02).astype(ml_dtypes.bfloat16)),
    },
    "rope_bands": jnp.asarray(
        1.0 / 10000.0 ** (np.arange(cfg.kv_channels // 8, dtype=np.float32)
                          / (cfg.kv_channels // 8))),
    "blocks_first": block(False),
    "blocks_mid": stack([block(True) for _ in range(cfg.num_layers - 2)]),
    "blocks_last": block(False),
    "final_layernorm": ln(cfg.hidden_size, f32=True),
    "final_linear": lin(cfg.hidden_size, patch_out),
}

if WEIGHTS == "int8":
    # the TPU serving path: requantize the fp8 distill-quant layout to
    # per-channel W8A8 int8 at load (quant.api.magi_distill_quant_to_int8) —
    # v5e has no fp8 ALUs, and per-forward e4m3 weight dequant measured
    # 12.0 s/forward vs the ~2.4 s matmul bound. The conversion runs in
    # host RAM (it transiently dequantizes the middle blocks to f32,
    # ~15 GB — an OOM if done on the chip).
    from inferix_tpu.quant.api import magi_distill_quant_to_int8

    params = magi_distill_quant_to_int8(params)
_host.__exit__(None, None, None)
params = jax.device_put(params, jax.devices()[0])  # one host->chip transfer

# MAGI_CFG=3: the BASE (non-distilled) sampling config — 3 window forwards
# per step (cond_pre_and_text/cond_pre batched rows + prefix-free uncond;
# reference example/magi/configs/4.5B/4.5B_config.json cfg_number: 3).
# Predicted ~2.5x the distilled forward (BASELINE.md round-3 item 4).
CFG_N = int(os.environ.get("MAGI_CFG", "1"))
rt = MagiRuntimeConfig(num_steps=64, window_size=4, chunk_width=6,
                       cfg_number=CFG_N, noise2clean_kvrange=(5, 4, 3, 2),
                       clean_chunk_kvrange=1,
                       # MAGI_SPAN=0 pins the full-cache grid (A/B for the
                       # span-sized-grid fix, exp/r5_span_grid.py)
                       span_grid=os.environ.get("MAGI_SPAN", "1") == "1",
                       # MAGI_HEAD_MAJOR=1: head-major window cache (the
                       # kernel-fold transpose-copy A/B, exp/r7_cache_layout)
                       kv_head_major=os.environ.get(
                           "MAGI_HEAD_MAJOR", "0") == "1",
                       # MAGI_ACTQUANT=1: fused one-pass act-quant kernels
                       # (round-4 A/B, ops/act_quant.py)
                       fused_act_quant=os.environ.get(
                           "MAGI_ACTQUANT", "0") == "1",
                       # MAGI_DISPATCH=per_chunk: sequential single-chunk
                       # window dispatches (the 24B memory lever; also the
                       # only way the cfg3 batch-2 whole-window program fits
                       # through the compile helper — its whole-window
                       # compile came back HTTP 500)
                       window_dispatch=os.environ.get(
                           "MAGI_DISPATCH", "per_chunk"))
W_CHUNKS = rt.window_size
# Quantized window cache (bf16 KV at 6.32 G doesn't fit next to the
# weights). MAGI_KV=int8 (default): int8 + per-(token,head) scales — the
# span kernel's column-scaling dequant runs at the bf16 kernel's rate.
# MAGI_KV=fp8: scale-free e4m3, cast-only dequant — measured HALF the
# attention rate (78 vs 157 TF/s, exp/r4_magi_attn.py).
KV = os.environ.get("MAGI_KV", "int8")
pipe = MagiPipeline(
    cfg, rt, params=params, latent_h=H, latent_w=W,
    max_chunks=W_CHUNKS, dtype=jnp.bfloat16,
    kv_dtype=jnp.float8_e4m3fn if KV == "fp8" else None,
    quantize_kv=(KV == "int8"))
assert pipe.batch == (2 if CFG_N >= 2 else 1), pipe.batch

from inferix_tpu.kvcache.cache import init_kv_cache

cap = jnp.asarray(rng.standard_normal(
    (1, cfg.caption_max_length, cfg.caption_channels),
    np.float32).astype(ml_dtypes.bfloat16))
cmask = jnp.ones((1, cfg.caption_max_length))
x_window = jnp.asarray(rng.standard_normal(
    (1, W_CHUNKS * rt.chunk_width, H, W, cfg.in_channels),
    np.float32).astype(ml_dtypes.bfloat16))
# cfg>=2 runs the cond/uncond halves as batch rows sharing the x window
# (generate_chunks does the same broadcast before _forward_window)
x_window = jnp.broadcast_to(x_window, (pipe.batch, *x_window.shape[1:]))
t_vals = np.array([0.9, 0.7, 0.4, 0.1])
kv_ranges = np.stack([np.zeros(W_CHUNKS, np.int32),
                      np.arange(1, W_CHUNKS + 1, dtype=np.int32)], axis=1)

if os.environ.get("MAGI_MEM_ONLY") == "1":
    # chipless program-footprint analysis (no HBM touched): compare temp /
    # code size across weights modes — a ballooned int8 temp would mean XLA
    # remats under HBM pressure, explaining int8 measuring slower e2e
    from inferix_tpu.utils.memory_analysis import abstractify

    with jax.default_device(_cpu0):
        cache0 = init_kv_cache(pipe.statics.spec)
        n_chunks = len(t_vals)
        t = jnp.broadcast_to(jnp.asarray(t_vals, jnp.float32)[None],
                             (1, n_chunks))
        caps = jnp.broadcast_to(cap[:, None],
                                (1, n_chunks, *cap.shape[1:]))
        masks = jnp.broadcast_to(cmask[:, None],
                                 (1, n_chunks, cmask.shape[-1]))
        kw = dict(x_window=x_window, t=t, captions=caps, caption_mask=masks,
                  cache=cache0, slice_point=jnp.int32(0),
                  kv_ranges=jnp.asarray(kv_ranges, jnp.int32))
        aparams, akw = abstractify((pipe.params, kw))
    compiled = pipe._fwd.lower(aparams, **akw).compile()
    ma = compiled.memory_analysis()
    print(json.dumps({
        "exp": "magi45b_mem", "weights": WEIGHTS, "layers": cfg.num_layers,
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 3),
        "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
        "code_mib": round(ma.generated_code_size_in_bytes / 2**20, 1),
    }), flush=True)
    # big copies (cache layout conversions show up here)
    import re

    for ln_ in compiled.as_text().splitlines():
        m = re.search(r"= \w*\[([0-9,]+)\][^ ]* copy\(", ln_)
        if m:
            n_el = 1
            for d in m.group(1).split(","):
                n_el *= int(d)
            if n_el >= (1 << 28):
                print("BIGCOPY:", ln_.strip()[:220], flush=True)
    sys.exit(0)

cache = init_kv_cache(pipe.statics.spec)
# warm/compile
velocity, cache = pipe._forward_window(x_window, t_vals, cap, cmask, cache,
                                       slice_point=0, kv_ranges=kv_ranges)
_sync(velocity)
_sync(cache.k)

n = 6
# MAGI_TRACE=1: capture a profiler trace of 2 warm forwards and print the
# top device ops (per-op attribution for the 27.4-vs-8.4 s investigation —
# exp/r6_op_breakdown.py's xplane walker)
if os.environ.get("MAGI_TRACE") == "1" and not TINY:
    sys.path.insert(0, "/root/repo/exp")
    from r6_op_breakdown import parse_xplane

    with jax.profiler.trace("/tmp/magi_trace"):
        for _ in range(2):
            velocity, cache = pipe._forward_window(
                x_window, t_vals, cap, cmask, cache, slice_point=0,
                kv_ranges=kv_ranges)
        _sync(velocity)
        _sync(cache.k)
    print(json.dumps({"magi_top_ops_ms_per_2fwd":
                      parse_xplane("/tmp/magi_trace", top=30)}, indent=1),
          flush=True)
t0 = time.perf_counter()
for _ in range(n):
    velocity, cache = pipe._forward_window(x_window, t_vals, cap, cmask,
                                           cache, slice_point=0,
                                           kv_ranges=kv_ranges)
_sync(velocity)
t_vel = time.perf_counter() - t0
_sync(cache.k)
fwd_s = (time.perf_counter() - t0) / n
print(f"# velocity-sync {t_vel/n:.3f} s/fwd, +cache.k sync "
      f"{fwd_s:.3f} s/fwd", flush=True)

steps_per_chunk = rt.num_steps // rt.window_size          # 16
chunk_s = steps_per_chunk * fwd_s
pixel_frames_per_chunk = rt.chunk_width * 4               # temporal factor 4
line = json.dumps({
    "exp": "magi45b_fp8_window_fwd", "tokens_per_fwd": rt.window_size * (H // 2) * (W // 2) * rt.chunk_width,
    "cfg_number": CFG_N,
    "weights": WEIGHTS, "kv_cache": KV, "layers": cfg.num_layers,
    "span_grid": rt.span_grid, "dispatch": rt.window_dispatch,
    "fwd_s": round(fwd_s, 3), "s_per_chunk": round(chunk_s, 2),
    "pixel_frames_per_s": round(pixel_frames_per_chunk / chunk_s, 3),
    "finite": bool(np.isfinite(np.asarray(
        jax.device_get(velocity[0, 0, 0, 0]))).all()),
})
print(line, flush=True)
if not TINY:
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")
