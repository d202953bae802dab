"""Fused per-token activation quantization (Pallas, TPU).

The W8A8 int8 linears (quant/api.py `quantized_linear`) quantize their
activations dynamically per token: absmax over the feature axis -> scale ->
round to int8. Left to XLA, that chain materializes intermediate passes over
the activation in HBM — the round-3 trace (exp/r6_results/op_breakdown.log)
attributes ~14 ms/forward to the fc2-input chain alone (`%fusion.317`:
gelu + rowmax writing the full bf16 [4680, 8960] tensor, then `%fusion.318`
re-reading it to emit int8) and ~2 ms/forward to each of the f32
materializations in front of the qkv/cross-q/fc1 quants
(`%multiply_reduce_fusion.{6,7,8}`), out of the 22.5 ms of measured
un-overlapped elementwise (exp/r6_results/ablate2.log).

These kernels do the whole chain in ONE pass: read the bf16 activation block
into VMEM, (optionally) apply the activation function, reduce the row absmax,
and write int8 + the f32 per-token scale. HBM traffic per int8 linear input
drops from (write bf16 + read bf16 + write s8) to (read bf16 + write s8).

The reference's analog is DAX's fused dynamic-quant CUDA epilogues
(`example/quantization/run_self_forcing_quantized.py:33-65` applies the
W8A8 recipe; the fused epilogue lives in the DAX library). Numerics: the
kernel replicates `quant.kernels.quantize_act_int8_per_token` (f32 absmax,
scale = max(absmax/127, 1e-8), round-half-even, clip) exactly; with
act="gelu" the tanh runs in f32 and is rounded to the activation dtype
before quantization, matching the XLA chain to 1 bf16 ulp (the engine A/B
gate is the quality harness, not bitwise identity — see
exp/r10_act_quant.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT8_MAX = 127.0


def _gelu_tanh_f32(x: jax.Array) -> jax.Array:
    # jax.nn.gelu(approximate=True) in f32
    c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _erf_f32(x: jax.Array) -> jax.Array:
    """erf from Mosaic-supported primitives (Abramowitz-Stegun 7.1.26,
    |err| <= 1.5e-7): Mosaic has no erf lowering (the MAGI aq run failed
    with 'Unimplemented primitive: erf'). The residual vs lax.erf is below
    one bf16 ulp, inside the fused path's quant-step tolerance budget."""
    a1 = jnp.float32(0.254829592)
    a2 = jnp.float32(-0.284496736)
    a3 = jnp.float32(1.421413741)
    a4 = jnp.float32(-1.453152027)
    a5 = jnp.float32(1.061405429)
    p = jnp.float32(0.3275911)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _quant_kernel(x_ref, q_ref, s_ref, *, act: Optional[str], in_dtype):
    xf = x_ref[...].astype(jnp.float32)
    if act == "gelu":
        # match the engine's `jax.nn.gelu(bf16) -> bf16` producer: compute in
        # f32, round to the activation dtype, quantize from those values
        xf = _gelu_tanh_f32(xf).astype(in_dtype).astype(jnp.float32)
    elif act == "gelu_exact":
        # MAGI mlp: jax.nn.gelu(approximate=False) — erf formulation
        # (in-kernel polynomial erf; Mosaic has no erf primitive)
        xf = (0.5 * xf * (1.0 + _erf_f32(xf * jnp.float32(0.7071067811865476)))
              ).astype(in_dtype).astype(jnp.float32)
    elif act == "silu_mul":
        # 24B SwiGLU: silu(gate f32) rounded to the act dtype, times up —
        # replicates the chain at models/magi/dit.py mlp tail exactly
        d = xf.shape[-1] // 2
        gate = xf[:, :d]
        gate = (gate * jax.nn.sigmoid(gate)).astype(in_dtype)  # silu -> bf16
        up = xf[:, d:].astype(in_dtype)  # exact: xf came from in_dtype
        xf = (gate * up).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    q_ref[...] = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    s_ref[...] = scale


@functools.partial(
    jax.jit, static_argnames=("act", "block_rows", "interpret")
)
def quantize_rows_int8(
    x: jax.Array,                 # [M, K]
    act: Optional[str] = None,    # None | "gelu" (applied before quant)
    block_rows: int = 0,          # 0 => auto from K
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-pass per-token int8 quant: (x_q s8 [M, K'], scale f32 [M, 1]).

    K' = K except act="silu_mul" (SwiGLU: K' = K // 2 — the kernel consumes
    [gate | up] and quantizes silu(gate) * up).
    """
    m, k = x.shape
    out_k = k // 2 if act == "silu_mul" else k
    assert k % 128 == 0 and out_k % 128 == 0, \
        "feature axis must be lane-aligned (caller gates)"
    if block_rows == 0:
        # keep in+out+double-buffering well under VMEM: bf16 in + s8 out is
        # 3 bytes/elem; 128 rows x 8960 cols x 3 x 2(buf) ~= 6.9 MB
        block_rows = 128 if k > 4096 else 256
    bm = block_rows
    mp = -(-m // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    q, s = pl.pallas_call(
        functools.partial(_quant_kernel, act=act, in_dtype=x.dtype),
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((bm, out_k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, out_k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * k,
            bytes_accessed=mp * k * x.dtype.itemsize + mp * out_k + mp * 4,
            transcendentals=mp * k if act in ("gelu", "gelu_exact",
                                              "silu_mul") else 0,
        ),
    )(x)
    return q[:m], s[:m]


# ---------------------------------------------------------------------------
# Fused LN(+AdaLN modulate / +affine) -> per-token int8 quant prologues
# ---------------------------------------------------------------------------
# The three block prologues (msa-LN+modulate -> qkv, norm3-LN -> cross-q,
# mlp-LN+modulate -> fc1) each write a bf16 [S, C] tensor that the int8
# linear immediately re-reads to quantize. These kernels run the whole
# prologue in one pass (read x -> write s8 + scale), replicating the exact
# cast chain of `ops.norms.layer_norm` + `causal_dit._modulate` +
# `quant.kernels.quantize_act_int8_per_token` (f32 LN, bf16 rounding at the
# same points). Reference analog: the Triton `range_mod_kernel_fwd`
# (`inferix/models/magi/dit/dit_module.py:205-294`) fuses the same
# norm/modulate class of op on GPU.


def _ln_mod_quant_kernel(x_ref, *refs, eps, mode, in_dtype):
    xf = x_ref[0].astype(jnp.float32) if x_ref.ndim == 3 \
        else x_ref[...].astype(jnp.float32)          # [bs, C]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps)               # f32 [bs, C]
    if mode == "modulate":
        sh_ref, sc_ref, q_ref, s_ref = refs
        # match layer_norm's bf16 cast, then _modulate's bf16 arithmetic.
        # mod blocks are [1, 1, C] (a 2-D [1, C] block on a [B*F, C] array
        # violates Mosaic's 8-sublane rule; with the extra unit dim the
        # block EQUALS the array dims, which Mosaic accepts)
        h = ln.astype(in_dtype)
        sc = (1.0 + sc_ref[0, 0].astype(jnp.float32)).astype(in_dtype)
        sh = sh_ref[0, 0].astype(in_dtype)
        h = h * sc[None, :] + sh[None, :]
    elif mode == "affine":
        w_ref, b_ref, q_ref, s_ref = refs
        # layer_norm applies weight/bias in f32, casts once at the end
        h = (ln * w_ref[0].astype(jnp.float32)
             + b_ref[0].astype(jnp.float32)).astype(in_dtype)
    else:  # plain LN
        q_ref, s_ref = refs
        h = ln.astype(in_dtype)
    hf = h.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    qv = jnp.clip(jnp.round(hf / scale), -127, 127).astype(jnp.int8)
    if q_ref.ndim == 3:
        q_ref[0], s_ref[0] = qv, scale
    else:
        q_ref[...], s_ref[...] = qv, scale


def _frame_block_rows(fs: int, cap: int = 520) -> int:
    """Largest multiple-of-8 divisor of fs that is <= cap (0 if none)."""
    best = 0
    for d in range(8, min(fs, cap) + 1, 8):
        if fs % d == 0:
            best = d
    return best


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def adaln_quantize_rows_int8(
    x: jax.Array,        # [B, S, C] with S = F * frame_seq
    shift: jax.Array,    # [B, F, C] f32
    scale_mod: jax.Array,  # [B, F, C] f32
    eps: float = 1e-6,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-pass LN + per-frame AdaLN modulate + per-token int8 quant.

    Returns (x_q s8 [B, S, C], scale f32 [B, S, 1]). Falls back to the
    composed XLA chain when the frame length doesn't tile.
    """
    b, s, c = x.shape
    f = shift.shape[1]
    fs = s // f
    bs = _frame_block_rows(fs) if (s % f == 0 and c % 128 == 0) else 0
    if bs == 0:
        from .norms import layer_norm

        h = layer_norm(x, eps=eps).reshape(b, f, fs, c)
        h = (h * (1.0 + scale_mod[:, :, None, :]).astype(h.dtype)
             + shift[:, :, None, :].astype(h.dtype)).reshape(b * s, c)
        from ..quant.kernels import quantize_act_int8_per_token

        q, sc = quantize_act_int8_per_token(h)
        return q.reshape(b, s, c), sc.reshape(b, s, 1)
    xr = x.reshape(b * f, fs, c)
    shr = shift.reshape(b * f, 1, c)
    scr = scale_mod.reshape(b * f, 1, c)
    q, sc = pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, eps=eps, mode="modulate",
                          in_dtype=x.dtype),
        grid=(b * f, fs // bs),
        in_specs=[
            pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * f, fs, c), jnp.int8),
            jax.ShapeDtypeStruct((b * f, fs, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * s * c,
            bytes_accessed=b * s * c * (x.dtype.itemsize + 1) + b * s * 4,
            transcendentals=0,
        ),
    )(xr, shr, scr)
    return q.reshape(b, s, c), sc.reshape(b, s, 1)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def ln_quantize_rows_int8(
    x: jax.Array,                     # [M, C]
    weight: Optional[jax.Array] = None,  # [C] affine (norm3) or None
    bias: Optional[jax.Array] = None,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-pass LN (optionally affine) + per-token int8 quant of [M, C]."""
    m, c = x.shape
    assert c % 128 == 0
    bm = block_rows
    mp = -(-m // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    mode = "affine" if weight is not None else "plain"
    args = [x]
    in_specs = [pl.BlockSpec((bm, c), lambda i: (i, 0))]
    if mode == "affine":
        args += [weight.reshape(1, c), bias.reshape(1, c)]
        in_specs += [pl.BlockSpec((1, c), lambda i: (0, 0))] * 2
    q, s = pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, eps=eps, mode=mode,
                          in_dtype=x.dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, c), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * mp * c,
            bytes_accessed=mp * c * (x.dtype.itemsize + 1) + mp * 4,
            transcendentals=0,
        ),
    )(*args)
    return q[:m], s[:m]
