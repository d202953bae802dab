"""Quantized matmul Pallas kernels: W8A8 INT8 and FP8 fused dequant+matmul.

TPU-native replacement for the reference's external quantized-GEMM paths —
flashinfer `bmm_fp8` (`inferix/models/magi/dit/dit_module.py:434-490`) and the
DAX dynamic-quant library (`example/quantization/run_self_forcing_quantized.py`).

Design for the v5e MXU:
* INT8: int8 x int8 -> int32 accumulation runs on the MXU at 2x bf16
  throughput. Scales are applied in the epilogue of the SAME kernel
  (per-token activation row scale x per-channel weight column scale), so
  the int32 accumulator never round-trips to HBM.
* FP8 (e4m3): v5e has no fp8 MXU path, so fp8 here is a MEMORY format —
  weights live in HBM as fp8 (+scale) halving weight bandwidth, and are
  dequantized to bf16 inside the kernel right before the bf16 MXU matmul.
* Activation quantization (dynamic per-token absmax, the DAX recipe) is
  plain XLA — it fuses into the surrounding elementwise ops.

Granularities (matching the reference's recipes):
  per-tensor:  one scale for W (and optionally A)
  per-channel: per-output-channel W scale x per-token A scale
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT8_MAX = 127.0
FP8_MAX = 448.0  # e4m3 max normal


# ---------------------------------------------------------------------------
# Host/XLA-side quantization helpers
# ---------------------------------------------------------------------------

def quantize_weight_int8(
    w: jax.Array, per_channel: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """w: [K, N] -> (w_q int8 [K, N], scale f32 [N] or [1])."""
    wf = w.astype(jnp.float32)
    if per_channel:
        absmax = jnp.max(jnp.abs(wf), axis=0)           # [N]
    else:
        absmax = jnp.max(jnp.abs(wf)).reshape(1)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_weight_fp8(
    w: jax.Array, per_channel: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """w: [K, N] -> (w_q float8_e4m3fn, scale f32 [N] or [1])."""
    wf = w.astype(jnp.float32)
    if per_channel:
        absmax = jnp.max(jnp.abs(wf), axis=0)
    else:
        absmax = jnp.max(jnp.abs(wf)).reshape(1)
    scale = jnp.maximum(absmax / FP8_MAX, 1e-8)
    w_q = (wf / scale).astype(jnp.float8_e4m3fn)
    return w_q, scale


def quantize_act_int8_per_token(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: [..., K] -> (x_q int8, scale f32 [..., 1]) — dynamic per-token."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


# ---------------------------------------------------------------------------
# INT8 fused dequant matmul kernel
# ---------------------------------------------------------------------------

def _int8_matmul_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *,
                        num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _():
        xs = xs_ref[...]            # [bm, 1] f32 per-token scale
        ws = ws_ref[...]            # [1, bn] f32 per-channel scale
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs * ws
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"),
)
def int8_matmul(
    x_q: jax.Array,     # [M, K] int8
    w_q: jax.Array,     # [K, N] int8
    x_scale: jax.Array,  # [M, 1] f32 (per-token) or [1, 1] (per-tensor)
    w_scale: jax.Array,  # [N] f32 (per-channel) or [1] (per-tensor)
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn: int = 256,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2

    def pad(a, axis, mult):
        p = (-a.shape[axis]) % mult
        if p == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, p)
        return jnp.pad(a, widths)

    bm = min(bm, -(-m // 32) * 32)
    bn = min(bn, -(-n // 128) * 128)
    bk = min(bk, -(-k // 128) * 128)

    x_q = pad(pad(x_q, 0, bm), 1, bk)
    w_q = pad(pad(w_q, 0, bk), 1, bn)
    xs = jnp.broadcast_to(x_scale.astype(jnp.float32), (m, 1))
    xs = pad(xs, 0, bm)
    ws = jnp.broadcast_to(w_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    ws = pad(ws, 1, bn)

    mp, kp = x_q.shape
    np_ = w_q.shape[1]
    grid = (mp // bm, np_ // bn, kp // bk)

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, num_k_blocks=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
            pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
    )(x_q, w_q, xs, ws)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# FP8 fused dequant matmul kernel (fp8 weights, bf16 compute)
# ---------------------------------------------------------------------------

def _fp8_matmul_kernel(x_ref, w_ref, ws_ref, o_ref, acc_ref, *,
                       num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)  # in-kernel dequant (scale in epilogue)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _():
        o_ref[...] = (acc_ref[...] * ws_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"),
)
def fp8_matmul(
    x: jax.Array,       # [M, K] bf16/f32 activations (unquantized)
    w_q: jax.Array,     # [K, N] float8_e4m3fn
    w_scale: jax.Array,  # [N] or [1] f32
    out_dtype=jnp.bfloat16,
    bm: int = 256,
    bn: int = 256,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2

    def pad(a, axis, mult):
        p = (-a.shape[axis]) % mult
        if p == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, p)
        return jnp.pad(a, widths)

    bm = min(bm, -(-m // 16) * 16)
    bn = min(bn, -(-n // 128) * 128)
    bk = min(bk, -(-k // 128) * 128)

    x = pad(pad(x.astype(jnp.bfloat16), 0, bm), 1, bk)
    w_q = pad(pad(w_q, 0, bk), 1, bn)
    ws = jnp.broadcast_to(w_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    ws = pad(ws, 1, bn)

    mp, kp = x.shape
    np_ = w_q.shape[1]
    grid = (mp // bm, np_ // bn, kp // bk)

    out = pl.pallas_call(
        functools.partial(_fp8_matmul_kernel, num_k_blocks=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
    )(x, w_q, ws)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# XLA reference implementations (numerics oracle + CPU fallback)
# ---------------------------------------------------------------------------

def int8_matmul_xla(x_q, w_q, x_scale, w_scale, out_dtype=jnp.bfloat16):
    acc = jnp.dot(x_q.astype(jnp.int32), w_q.astype(jnp.int32))
    out = acc.astype(jnp.float32) * x_scale.astype(jnp.float32) \
        * w_scale.astype(jnp.float32).reshape(1, -1)
    return out.astype(out_dtype)


def fp8_matmul_xla(x, w_q, w_scale, out_dtype=jnp.bfloat16):
    acc = jnp.dot(x.astype(jnp.float32), w_q.astype(jnp.float32))
    return (acc * w_scale.astype(jnp.float32).reshape(1, -1)).astype(out_dtype)
