"""Causal 3D VAE (Wan 2.1) in functional JAX — chunked streaming decode.

Capability parity with the reference `WanVAE_`
(`inferix/models/wan_base/vae.py`): CausalConv3d stacks with per-conv temporal
feature caches enabling chunked encode ([1, 4, 4, ...] pixel frames) and
frame-by-frame latent decode (`cached_decode`, vae.py:572-596) — the mechanism
behind PER_BLOCK streaming. Re-designed TPU-first:

* channels-last layout [B, T, H, W, C] (conv via lax.conv_general_dilated,
  NDHWC) — XLA maps these onto the MXU as implicit GEMMs.
* the mutable feat_cache/feat_idx machinery (vae.py:105-137, 'Rep' markers,
  in-place cache juggling) becomes an explicit, immutable cache pytree:
  each temporal conv owns a rolling buffer of its last (kt-1) input frames,
  zero-initialized (zero cache == the reference's causal zero padding).
  First-chunk special cases (downsample3d skip, upsample3d 'Rep' skip) are
  static `first=True` trace variants.
* decode processes ONE latent frame per call (as the reference does
  internally); the wrapper loops, so streaming per-block decode is just
  calling `decode_chunk` as latents arrive.

Default config (Wan2.1_VAE): dim=96, z_dim=16, dim_mult=[1,2,4,4],
num_res_blocks=2, temperal_downsample=[False, True, True]
(`vae.py:614-630 _video_vae`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
Cache = Dict[str, jax.Array]

CACHE_T = 2  # frames of temporal context carried across chunks

# Per-channel latent normalization (reference
# `models/self_forcing/wrapper.py:65-74`).
LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temperal_downsample)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def _conv_init(key, kt, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kt * kh * kw * cin
    scale = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (kt, kh, kw, cin, cout), dtype,
                                minval=-scale, maxval=scale),
        "b": jax.random.uniform(bkey, (cout,), dtype, minval=-scale,
                                maxval=scale),
    }


# Conv implementation switch (trace-time static; set before building the
# jitted decode). "xla" = conv_general_dilated (41 TF/s at the decode's
# finest-level 3x3x3 shape — exp/conv3d.log). "shifted_matmul" reformulates
# stride-1 convs as a sum of tap-shifted [M, Cin] x [Cin, Cout] MXU matmuls
# on slices of one padded input — no conv lowering at all; the candidate
# from exp/r12_vae_conv.py for the VAE-bound TRUE_STREAMING wall (VERDICT
# r3 weak #6). Flip only on a measured win.
_CONV_IMPL = "xla"
# Tests opt in to running the halo kernel in Pallas interpret mode on CPU
# (orders of magnitude slower than XLA conv — never the production route).
_HALO_INTERPRET_OK = False


def set_vae_conv_impl(impl: str, interpret_ok: bool = False) -> None:
    """"xla" | "shifted_matmul" | "halo" | "halo_w8a8".

    halo_w8a8 runs the 3x3x3 convs as int8 x int8 MXU matmuls (per-tensor
    activation scale, per-cout weight scale — ops/halo_conv.py
    halo_conv3d_w8a8): measured -28..-37% vs the XLA conv on every decode
    res-conv class (exp/r6_results/r14_decode_profile.log). It is a LOSSY
    serving mode — the quality harness (bench_quality) bounds the decode
    delta; default stays the lossless impl."""
    global _CONV_IMPL, _HALO_INTERPRET_OK
    assert impl in ("xla", "shifted_matmul", "halo", "halo_w8a8")
    _CONV_IMPL = impl
    _HALO_INTERPRET_OK = interpret_ok


# Upsample-conv formulation. "repeat" = nearest-2x jnp.repeat then 3x3 SAME
# conv through _conv2d (the measured round-4/5 configuration; under
# conv_impl="halo_w8a8" the kt=1 conv routes to the int8 halo kernel).
# "phase" = _upsample2x_conv3x3: 4 exact 2x2 convs at LOW resolution
# (16/36 of the MACs, no repeat/pad layout ops) — bit-equal by test, but a
# first TRUE_STREAMING run with it measured SLOWER (7.318 vs 7.857 pixel
# f/s; the 4 small convs + phase-interleave transpose lose more than the
# saved MACs buy), so it ships opt-in pending the >1% flip rule like every
# other formulation switch. It also bypasses _conv2d, so it never applies
# under halo_w8a8.
_UPSAMPLE_IMPL = "repeat"


def set_vae_upsample_impl(impl: str) -> None:
    """"repeat" | "phase" — see _UPSAMPLE_IMPL comment."""
    global _UPSAMPLE_IMPL
    assert impl in ("repeat", "phase")
    _UPSAMPLE_IMPL = impl


def _spatial_pads(kh, kw, spatial_pad):
    if spatial_pad == "same":
        return [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
    if spatial_pad == "down":  # ZeroPad2d((0,1,0,1)) as in Resample
        return [(0, 1), (0, 1)]
    return [(0, 0), (0, 0)]


def _conv3d_shifted_matmul(p, x, spatial_pad):
    """Stride-1 conv as 27 (kt*kh*kw) tap-shifted MXU matmuls, f32 accum.
    Temporal axis is VALID (the causal caller prepends kt-1 frames)."""
    kt, kh, kw, cin, cout = p["w"].shape
    (ph0, ph1), (pw0, pw1) = _spatial_pads(kh, kw, spatial_pad)
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, tp_, hp, wp, _ = xp.shape
    t_out, h_out, w_out = tp_ - (kt - 1), hp - (kh - 1), wp - (kw - 1)
    m = b * t_out * h_out * w_out
    acc = jnp.zeros((m, cout), jnp.float32)
    w = p["w"].astype(x.dtype)
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                xs = jax.lax.dynamic_slice(
                    xp, (0, dt, dh, dw, 0), (b, t_out, h_out, w_out, cin)
                ).reshape(m, cin)
                acc = acc + jax.lax.dot_general(
                    xs, w[dt, dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    out = acc.reshape(b, t_out, h_out, w_out, cout)
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def _conv3d(p, x, t_stride=1, s_stride=1, spatial_pad="same"):
    """x: [B,T,H,W,C]; temporal padding handled by the caller (causal)."""
    kt, kh, kw = p["w"].shape[:3]
    # Halo routing is gated to the 3D 3x3x3 class: the amortized A/B
    # (exp/r6_results/r13_halo_v4.log) has the Pallas kernel winning every
    # kt==3 shape (res_L3 13.2 vs 15.6 ms, L1b 3.61 vs 3.77, L2 tie) and
    # LOSING the kt==1 upsample conv (9.1 vs 8.3) — XLA's 2D conv lowering
    # is already good there.
    # halo gate: 3x3x3 for the lossless kernel (bf16 halo LOSES the kt==1
    # upsample class to XLA's 2D lowering, r13); w8a8 additionally takes
    # the 1x3x3 upsample convs — the int8 MXU rate covers what the bf16
    # kernel lost there (A/B'd at the engine level like everything else).
    kt_ok = (kt == 3) if _CONV_IMPL == "halo" else (kt in (1, 3))
    if (_CONV_IMPL in ("halo", "halo_w8a8") and t_stride == 1
            and s_stride == 1
            and kt_ok and kh == 3 and kw == 3 and spatial_pad == "same"
            and x.shape[2] * x.shape[3] >= 256):
        interp = jax.default_backend() != "tpu"
        # Off-TPU the Pallas kernel only runs in interpret mode, which is
        # orders of magnitude slower than XLA conv — fall through unless a
        # test explicitly opted in (set_vae_conv_impl interpret_ok=True).
        if not interp or _HALO_INTERPRET_OK:
            from ...ops.halo_conv import halo_conv3d, halo_conv3d_w8a8
            kern = (halo_conv3d_w8a8 if _CONV_IMPL == "halo_w8a8"
                    else halo_conv3d)
            return jnp.stack(
                [kern(x[i], p["w"], p["b"], interpret=interp)
                 for i in range(x.shape[0])], axis=0)
    if (_CONV_IMPL == "shifted_matmul" and t_stride == 1 and s_stride == 1
            and kt * kh * kw > 1):
        return _conv3d_shifted_matmul(p, x, spatial_pad)
    if spatial_pad == "same":
        pads = [(0, 0), ((kh - 1) // 2, (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) // 2)]
    elif spatial_pad == "down":  # ZeroPad2d((0,1,0,1)) as in Resample
        pads = [(0, 0), (0, 1), (0, 1)]
    else:
        pads = [(0, 0), (0, 0), (0, 0)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(t_stride, s_stride, s_stride),
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _conv2d(p, x, stride=1, spatial_pad="same"):
    """Per-frame 2D conv; x: [B,T,H,W,C], weight stored as [1,kh,kw,cin,cout]."""
    return _conv3d(p, x, t_stride=1, s_stride=stride, spatial_pad=spatial_pad)


class _CacheCtx:
    """Threads the per-conv cache dict through apply calls (replaces the
    reference's feat_cache list + feat_idx counter)."""

    def __init__(self, cache: Optional[Cache], first: bool):
        self.cache = dict(cache) if cache else {}
        self.first = first
        self._n = 0

    def slot(self) -> str:
        name = f"c{self._n}"
        self._n += 1
        return name

    def pull(self, name: str, shape, dtype) -> jax.Array:
        if name in self.cache:
            return self.cache[name]
        return jnp.zeros(shape, dtype)

    def push(self, name: str, value: jax.Array) -> None:
        self.cache[name] = value


def causal_conv3d(p, x, ctx: _CacheCtx, t_stride=1, s_stride=1,
                  spatial_pad="same"):
    """Temporally-causal conv: prepend the rolling (kt-1)-frame cache (zeros
    at stream start == the reference's causal zero padding)."""
    kt = p["w"].shape[0]
    if kt == 1:
        return _conv3d(p, x, t_stride, s_stride, spatial_pad)
    name = ctx.slot()
    b, t, h, w, c = x.shape
    cache = ctx.pull(name, (b, kt - 1, h, w, c), x.dtype)
    x_in = jnp.concatenate([cache, x], axis=1)
    ctx.push(name, x_in[:, -(kt - 1):])
    return _conv3d(p, x_in, t_stride, s_stride, spatial_pad)


def rms_norm_spatial(p, x, eps: float = 1e-12):
    """Reference RMS_norm (vae.py:39-58): L2-normalize over channels * sqrt(C)
    * gamma. Channels-last."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    out = xf / jnp.maximum(norm, eps) * math.sqrt(c)
    return (out * p["gamma"].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_res_block(key, cin, cout):
    k = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin,))},
        "conv1": _conv_init(k[0], 3, 3, 3, cin, cout),
        "norm2": {"gamma": jnp.ones((cout,))},
        "conv2": _conv_init(k[1], 3, 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(k[2], 1, 1, 1, cin, cout)
    return p


def res_block(p, x, ctx: _CacheCtx):
    h = _conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = jax.nn.silu(rms_norm_spatial(p["norm1"], x))
    y = causal_conv3d(p["conv1"], y, ctx)
    y = jax.nn.silu(rms_norm_spatial(p["norm2"], y))
    y = causal_conv3d(p["conv2"], y, ctx)
    return y + h


def init_attn_block(key, dim):
    k = jax.random.split(key, 2)
    return {
        "norm": {"gamma": jnp.ones((dim,))},
        "qkv": _conv_init(k[0], 1, 1, 1, dim, dim * 3),
        # reference zero-inits the output projection (vae.py:234)
        "proj": {"w": jnp.zeros((1, 1, 1, dim, dim)), "b": jnp.zeros((dim,))},
    }


def attn_block(p, x):
    """Single-head per-frame spatial attention (vae.py:221-259).

    At the decode-real shape (480x832 latents -> HW=6240 tokens) the naive
    einsum materializes a [T, 6240, 6240] f32 logits tensor (467 MB) — the
    r16 decode trace attributes ~50 ms/chunk to its fusions. Large frames
    route through the chunked online-softmax attention instead (same
    numerics to reassociation). NOT the Pallas flash kernel: with a single
    384-dim head there are only B*T grid-parallel units and the kernel
    measured ~0.8 s/chunk — 16x worse than the einsum it replaced
    (exp/r6_results/q2_decode_xla.log vs vae_decode_xla.log)."""
    b, t, h, w, c = x.shape
    y = rms_norm_spatial(p["norm"], x)
    qkv = _conv3d(p["qkv"], y)                      # [B,T,H,W,3C]
    qkv = qkv.reshape(b * t, h * w, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if h * w >= 4096:
        from ...ops.attention import attention_chunked

        o, _ = attention_chunked(q[:, :, None], k[:, :, None],
                                 v[:, :, None], chunk_size=2048)
        o = o[:, :, 0]
    else:
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = o.reshape(b, t, h, w, c)
    return x + _conv3d(p["proj"], o)


def init_resample(key, dim, mode):
    # NOTE: mode is NOT stored in the params (strings are not pytree leaves);
    # callers encode it in the containing dict key ("resample:<mode>").
    p = {}
    k = jax.random.split(key, 2)
    if mode in ("upsample2d", "upsample3d"):
        p["conv"] = _conv_init(k[0], 1, 3, 3, dim, dim // 2)
        if mode == "upsample3d":
            p["time_conv"] = _conv_init(k[1], 3, 1, 1, dim, dim * 2)
    elif mode in ("downsample2d", "downsample3d"):
        p["conv"] = _conv_init(k[0], 1, 3, 3, dim, dim)
        if mode == "downsample3d":
            p["time_conv"] = _conv_init(k[1], 3, 1, 1, dim, dim)
    return p


def _upsample2x_conv3x3(p, x):
    """nearest-2x spatial upsample + 3x3 SAME conv, as 4 phase-wise 2x2
    convs at LOW resolution (sub-pixel / pixel-shuffle formulation).

    Output pixel (2i+di, 2j+dj) of conv(repeat2x(x)) reads upsampled rows
    {2i+di-1, 2i+di, 2i+di+1}, which map (floor-div 2) onto at most TWO
    distinct source rows, with the 3x3 row weights pairwise summed:
      di=0: rows (i-1, i) with weights (W0, W1+W2)
      di=1: rows (i, i+1) with weights (W0+W1, W2)
    and the same along columns — so each phase is an exact 2x2 conv on x.
    vs repeat+conv: 16/36 of the MACs, reads x once at low res instead of
    the 4x-repeated tensor, and the repeat/pad/copy layout ops vanish (the
    r16 decode trace billed them ~18 ms/chunk on top of the ~25 ms conv
    fusions this replaces). Identical math to fp reassociation; border
    zero-pads line up exactly (upsampled row -1/2H <-> source row -1/H).
    """
    w = p["w"]  # [1, 3, 3, cin, cout]
    b_, t, h, wd, c = x.shape
    # per-phase pairwise-summed kernels [1, 2, 2, cin, cout]
    row = {
        0: jnp.stack([w[:, 0], w[:, 1] + w[:, 2]], axis=1),
        1: jnp.stack([w[:, 0] + w[:, 1], w[:, 2]], axis=1),
    }
    pad = {0: (1, 0), 1: (0, 1)}
    phases = []
    for di in (0, 1):
        for dj in (0, 1):
            wk = row[di]
            wk = jnp.stack([wk[:, :, 0], wk[:, :, 1] + wk[:, :, 2]], axis=2) \
                if dj == 0 else \
                jnp.stack([wk[:, :, 0] + wk[:, :, 1], wk[:, :, 2]], axis=2)
            y = jax.lax.conv_general_dilated(
                x, wk.astype(x.dtype), window_strides=(1, 1, 1),
                padding=[(0, 0), pad[di], pad[dj]],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            phases.append(y)
    cout = phases[0].shape[-1]
    y = jnp.stack(phases, axis=4).reshape(b_, t, h, wd, 2, 2, cout)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b_, t, 2 * h, 2 * wd, cout)
    return y + p["b"].astype(x.dtype)


def resample(p, x, ctx: _CacheCtx, mode: str):
    b, t, h, w, c = x.shape

    if mode == "upsample3d":
        name = ctx.slot()
        if ctx.first and t == 1:
            # reference 'Rep' marker: the FIRST frame passes through
            # untouched, cache stays zeros (vae.py:108-112)
            pass
        else:
            if ctx.first:
                # first call with a multi-frame block: frame 0 is the 'Rep'
                # passthrough; frames 1..t-1 run the cached-conv path seeded
                # with the zeros the per-frame stream would have (bit-equal
                # to feeding the frames one at a time)
                head, tail = x[:, :1], x[:, 1:]
                x_in = jnp.concatenate(
                    [jnp.zeros((b, 2, h, w, c), x.dtype), tail], axis=1)
            else:
                head = None
                cache = ctx.pull(name, (b, 2, h, w, c), x.dtype)
                x_in = jnp.concatenate([cache, x], axis=1)
            ctx.push(name, x_in[:, -2:])
            tt = x_in.shape[1] - 2
            y = _conv3d(p["time_conv"], x_in, spatial_pad="none")  # [B,tt,h,w,2C]
            # interleave: channel groups (2, C) -> doubled frames
            y = y.reshape(b, tt, h, w, 2, c)
            y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, tt * 2, h, w, c)
            x = y if head is None else jnp.concatenate([head, y], axis=1)
            t = x.shape[1]

    if mode in ("upsample2d", "upsample3d"):
        # nearest-exact 2x then 3x3 conv to half channels; "phase" opt-in
        # computes it as 4 phase-wise 2x2 convs at LOW resolution
        # (see _upsample2x_conv3x3 / _UPSAMPLE_IMPL)
        if _UPSAMPLE_IMPL == "phase" and _CONV_IMPL != "halo_w8a8":
            x = _upsample2x_conv3x3(p["conv"], x)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = _conv2d(p["conv"], x)
    elif mode in ("downsample2d", "downsample3d"):
        x = _conv2d(p["conv"], x, stride=2, spatial_pad="down")
        if mode == "downsample3d":
            name = ctx.slot()
            if ctx.first:
                ctx.push(name, x[:, -1:])
            else:
                cache = ctx.pull(name, (x.shape[0], 1, *x.shape[2:]), x.dtype)
                new_cache = x[:, -1:]
                x = _conv3d(p["time_conv"],
                            jnp.concatenate([cache, x], axis=1),
                            t_stride=2, spatial_pad="none")
                ctx.push(name, new_cache)
    return x


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def init_encoder(key, cfg: VAEConfig):
    dims = [cfg.dim * u for u in (1, *cfg.dim_mult)]
    keys = iter(jax.random.split(key, 64))
    p: Params = {"conv1": _conv_init(next(keys), 3, 3, 3, 3, dims[0])}
    downs: List[Params] = []
    scale = 1.0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            downs.append({"res": init_res_block(next(keys), cin, cout)})
            if scale in cfg.attn_scales:
                downs.append({"attn": init_attn_block(next(keys), cout)})
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            downs.append({f"resample:{mode}": init_resample(next(keys), cout, mode)})
            scale /= 2.0
    p["downsamples"] = downs
    p["middle"] = {
        "res1": init_res_block(next(keys), dims[-1], dims[-1]),
        "attn": init_attn_block(next(keys), dims[-1]),
        "res2": init_res_block(next(keys), dims[-1], dims[-1]),
    }
    p["head_norm"] = {"gamma": jnp.ones((dims[-1],))}
    p["head_conv"] = _conv_init(next(keys), 3, 3, 3, dims[-1], cfg.z_dim * 2)
    return p


def encoder_apply(p, x, ctx: _CacheCtx):
    x = causal_conv3d(p["conv1"], x, ctx)
    for layer in p["downsamples"]:
        if "res" in layer:
            x = res_block(layer["res"], x, ctx)
        elif "attn" in layer:
            x = attn_block(layer["attn"], x)
        else:
            (key,) = layer.keys()
            x = resample(layer[key], x, ctx, mode=key.split(":")[1])
    x = res_block(p["middle"]["res1"], x, ctx)
    x = attn_block(p["middle"]["attn"], x)
    x = res_block(p["middle"]["res2"], x, ctx)
    x = jax.nn.silu(rms_norm_spatial(p["head_norm"], x))
    return causal_conv3d(p["head_conv"], x, ctx)


def init_decoder(key, cfg: VAEConfig):
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1], *reversed(cfg.dim_mult))]
    keys = iter(jax.random.split(key, 64))
    p: Params = {"conv1": _conv_init(next(keys), 3, 3, 3, cfg.z_dim, dims[0])}
    p["middle"] = {
        "res1": init_res_block(next(keys), dims[0], dims[0]),
        "attn": init_attn_block(next(keys), dims[0]),
        "res2": init_res_block(next(keys), dims[0], dims[0]),
    }
    ups: List[Params] = []
    scale = 1.0 / 2 ** (len(cfg.dim_mult) - 2)
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2
        for _ in range(cfg.num_res_blocks + 1):
            ups.append({"res": init_res_block(next(keys), cin, cout)})
            if scale in cfg.attn_scales:
                ups.append({"attn": init_attn_block(next(keys), cout)})
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            ups.append({f"resample:{mode}": init_resample(next(keys), cout, mode)})
            scale *= 2.0
    p["upsamples"] = ups
    p["head_norm"] = {"gamma": jnp.ones((cfg.dim,))}
    p["head_conv"] = _conv_init(next(keys), 3, 3, 3, cfg.dim, 3)
    return p


def decoder_apply(p, x, ctx: _CacheCtx):
    x = causal_conv3d(p["conv1"], x, ctx)
    x = res_block(p["middle"]["res1"], x, ctx)
    x = attn_block(p["middle"]["attn"], x)
    x = res_block(p["middle"]["res2"], x, ctx)
    for layer in p["upsamples"]:
        if "res" in layer:
            x = res_block(layer["res"], x, ctx)
        elif "attn" in layer:
            x = attn_block(layer["attn"], x)
        else:
            (key,) = layer.keys()
            x = resample(layer[key], x, ctx, mode=key.split(":")[1])
    x = jax.nn.silu(rms_norm_spatial(p["head_norm"], x))
    return causal_conv3d(p["head_conv"], x, ctx)


# ---------------------------------------------------------------------------
# Public VAE wrapper
# ---------------------------------------------------------------------------

class CausalVAE:
    """Functional VAE with jitted chunked encode/decode.

    Latents use the pipeline layout [B, T_latent, H/8, W/8, z] with per-channel
    normalization (mean/std) applied, matching `WanVAEWrapper.encode_to_latent
    / decode_to_pixel` (`wrapper.py:87-168`).
    """

    def __init__(self, cfg: VAEConfig = VAEConfig(), params: Optional[Params] = None,
                 key: Optional[jax.Array] = None, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        if params is None:
            key = key if key is not None else jax.random.key(0)
            ek, dk, ck1, ck2 = jax.random.split(key, 4)
            params = {
                "encoder": init_encoder(ek, cfg),
                "decoder": init_decoder(dk, cfg),
                "conv1": _conv_init(ck1, 1, 1, 1, cfg.z_dim * 2, cfg.z_dim * 2),
                "conv2": _conv_init(ck2, 1, 1, 1, cfg.z_dim, cfg.z_dim),
            }
        if dtype != jnp.float32:
            # honor the requested compute dtype (bf16 decode is the serving
            # config: same conv rates at half the HBM/param traffic)
            params = jax.tree.map(
                lambda a: a.astype(dtype)
                if getattr(a, "dtype", None) == jnp.float32 else a, params)
        self.params = params
        self._decode_first = jax.jit(self._decode_chunk_impl,
                                     static_argnames=("first",))
        self._encode_chunk = jax.jit(self._encode_chunk_impl,
                                     static_argnames=("first",))

    # -- decode -------------------------------------------------------------

    def _latent_stats(self, dtype):
        z = self.cfg.z_dim
        mean, std = LATENT_MEAN, LATENT_STD
        if z <= mean.shape[0]:
            mean, std = mean[:z], std[:z]
        else:
            mean = np.pad(mean, (0, z - mean.shape[0]))
            std = np.pad(std, (0, z - std.shape[0]), constant_values=1.0)
        return jnp.asarray(mean, dtype), jnp.asarray(std, dtype)

    def _decode_chunk_impl(self, params, z, cache, *, first):
        ctx = _CacheCtx(cache, first)
        mean, std = self._latent_stats(z.dtype)
        z = z * std + mean
        x = _conv3d(params["conv2"], z)
        out = decoder_apply(params["decoder"], x, ctx)
        return out, ctx.cache

    def decode_chunk(self, z_frame: jax.Array, cache: Optional[Cache],
                     first: bool) -> Tuple[jax.Array, Cache]:
        """Decode T latent frames [B, T, h, w, z] -> pixels
        [B, 4T or 4T-3, H, W, 3] (the stream's first frame expands to one
        pixel frame, every other to four). Multi-frame chunks match feeding
        frames one at a time (to conv-fusion reassociation noise, ~1e-7 f32)
        and amortize the dispatch chain — generators hand the VAE whole
        3-frame blocks."""
        return self._decode_first(self.params, z_frame, cache, first=first)

    def decode(self, latents: jax.Array, chunk: int = 3) -> jax.Array:
        """latents: [B, T, h, w, z] -> video [B, 1+4(T-1), H, W, 3] in [-1, 1].

        Decodes `chunk` latent frames per dispatch (bit-equal to per-frame
        streaming; multi-frame chunks amortize the conv dispatch chain)."""
        chunks = []
        cache: Optional[Cache] = None
        for i in range(0, latents.shape[1], chunk):
            out, cache = self.decode_chunk(latents[:, i:i + chunk], cache,
                                           first=(i == 0))
            chunks.append(out)
        video = jnp.concatenate(chunks, axis=1)
        return jnp.clip(video, -1.0, 1.0)

    # -- encode -------------------------------------------------------------

    def _encode_chunk_impl(self, params, x, cache, *, first):
        ctx = _CacheCtx(cache, first)
        out = encoder_apply(params["encoder"], x, ctx)
        out = _conv3d(params["conv1"], out)
        mu = out[..., : self.cfg.z_dim]
        mean, std = self._latent_stats(mu.dtype)
        return (mu - mean) / std, ctx.cache

    def encode(self, video: jax.Array) -> jax.Array:
        """video: [B, T, H, W, 3] with T = 1 + 4k -> latents [B, 1+k, h, w, z]."""
        t = video.shape[1]
        assert (t - 1) % 4 == 0, f"pixel frames must be 1+4k, got {t}"
        outs = []
        cache: Optional[Cache] = None
        pos = 0
        for i in range(1 + (t - 1) // 4):
            n = 1 if i == 0 else 4
            out, cache = self._encode_chunk(
                self.params, video[:, pos:pos + n], cache, first=(i == 0)
            )
            outs.append(out)
            pos += n
        return jnp.concatenate(outs, axis=1)
