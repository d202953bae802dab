"""Halo-block Pallas conv for the VAE's stride-1 3x3(x3) convs.

XLA's conv_general_dilated runs the decode's hottest conv at ~20 TF/s
(exp/r6_results/r12_vae_conv.log — [1,4,480,832,96] 3x3x3, 39 ms), 2.8x off
the ~56%-of-peak MXU ceiling its 96-channel operands allow. The loss is the
conv lowering, not the arithmetic: the same FLOPs as 27 tap-shifted MXU
matmuls would be compute-bound at ~7 ms, but expressing that in XLA
(`_conv3d_shifted_matmul`) materializes all 27 input shifts in HBM and loses
14x. This kernel keeps the shifts in VMEM where they are free-ish:

  grid = (T_out, H_blocks, Cout_blocks)
  * the input stays in HBM (memory_space=ANY); each (t, h) step DMAs one
    halo block x[t : t+kt, h*BH : h*BH + BH + kh-1, :, :] into a
    double-buffered VMEM scratch — the NEXT step's DMA is issued before the
    current step's compute, so the copy rides under the 27 matmuls.
  * each tap (dt, dh, dw) is a static [BH*W, Cin] x [Cin, Cout_blk] MXU
    matmul on an in-VMEM slice of the halo block, accumulated in f32.
  * Cout blocking bounds VMEM (weights are [taps, Cin, Cout_blk] per step).

Reference analog: the reference leans on cuDNN for these convs
(`inferix/models/wan_base/vae.py` CausalConv3d); on TPU the equivalent of
"the vendor conv library" is this kernel.

Semantics: temporal VALID (the causal caller prepends kt-1 context frames),
spatial SAME (kh==kw==3, stride 1), bias included. Output matches
lax.conv_general_dilated(NDHWC) to f32-accumulation tolerance.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h_out: int, wp: int, c_pad: int, kt: int, kw: int,
             cout_blk: int, vmem_budget: int = 13 * 2**20,
             itemsize: int = 2) -> int:
    """Largest H-block in {16, 8, 4, 2, 1} whose double-buffered halo block
    + kw f32/i32 products + weight block fit the VMEM budget."""
    co_lanes = math.ceil(cout_blk / 128) * 128
    for bh in (16, 8, 4, 2, 1):
        if bh > h_out:
            continue
        # itemsize follows the actual input dtype (bf16/f32/int8) — an f32
        # input doubles the halo buffer, im2col panel, and weight terms.
        need = (2 * kt * (bh + 2) * wp * c_pad * itemsize   # x double buffer
                + bh * wp * kt * 3 * c_pad * itemsize       # im2col panel
                + kw * bh * wp * co_lanes * 4               # per-dw products
                + 2 * kw * kt * 3 * c_pad * co_lanes * itemsize)  # weights x2
        if need <= vmem_budget:
            return bh
    return 1


def _halo_conv_kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, sems, *,
                      kt: int, kh: int, kw: int, bh: int, w_out: int,
                      n_h: int, n_t: int):
    t = pl.program_id(0)
    hb = pl.program_id(1)
    co = pl.program_id(2)
    step = t * n_h + hb
    n_steps = n_t * n_h

    def dma(slot, tt, hh):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tt, kt), pl.ds(hh * bh, bh + kh - 1)],
            xbuf.at[slot],
            sems.at[slot],
        )

    cur = step % 2

    @pl.when((step == 0) & (co == 0))
    def _warmup():
        dma(cur, t, hb).start()

    @pl.when(co == 0)
    def _wait_cur():
        dma(cur, t, hb).wait()

    @pl.when((co == 0) & (step + 1 < n_steps))
    def _prefetch_next():
        nstep = step + 1
        dma((cur + 1) % 2, nstep // n_h, nstep % n_h).start()

    # One K-folded matmul per dw: the kt*kh row-shifted views of the halo
    # block concatenate along lanes (each a FREE row slice + layout-free
    # [bh, wp, C] -> [bh*wp, C] merge — wp is a 16-multiple) into a
    # [bh*wp, kt*kh*C] im2col panel, so the MXU sees kw large K=kt*kh*C
    # matmuls instead of kt*kh*kw small ones. The kw W-shifts are applied
    # ONCE at the end on the f32 products. (v1 sliced the bf16 input per
    # tap — Mosaic sublane relayouts ate the win; v2's 27 small matmuls
    # with scratch-accumulator round-trips starved the MXU at ~26 TF/s —
    # exp/r6_results/r13_halo*.log.)
    wp = xbuf.shape[3]
    cp = xbuf.shape[4]
    cout_blk = out_ref.shape[-1]
    lhs = jnp.concatenate(
        [xbuf[cur, dt, dh:dh + bh, :, :].reshape(bh * wp, cp)
         for dt in range(kt) for dh in range(kh)], axis=1)
    y = [jax.lax.dot_general(lhs, w_ref[dw], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .reshape(bh, wp, cout_blk)[:, dw:dw + w_out, :]
         for dw in range(kw)]
    out = sum(y[1:], y[0]) + b_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(1, bh, w_out, cout_blk).astype(out_ref.dtype)


def _halo_conv_kernel_i8(x_hbm, w_ref, sv_ref, b_ref, out_ref, xbuf, sems, *,
                         kt: int, kh: int, kw: int, bh: int, w_out: int,
                         n_h: int, n_t: int):
    """int8 x int8 -> int32 variant: same halo/im2col structure, MXU runs at
    the 2x int8 rate; the per-cout scale vector (s_x * s_w) is applied once
    on the combined i32 products."""
    t = pl.program_id(0)
    hb = pl.program_id(1)
    co = pl.program_id(2)
    step = t * n_h + hb
    n_steps = n_t * n_h

    def dma(slot, tt, hh):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tt, kt), pl.ds(hh * bh, bh + kh - 1)],
            xbuf.at[slot], sems.at[slot])

    cur = step % 2

    @pl.when((step == 0) & (co == 0))
    def _warmup():
        dma(cur, t, hb).start()

    @pl.when(co == 0)
    def _wait_cur():
        dma(cur, t, hb).wait()

    @pl.when((co == 0) & (step + 1 < n_steps))
    def _prefetch_next():
        nstep = step + 1
        dma((cur + 1) % 2, nstep // n_h, nstep % n_h).start()

    wp = xbuf.shape[3]
    cp = xbuf.shape[4]
    cout_blk = out_ref.shape[-1]
    lhs = jnp.concatenate(
        [xbuf[cur, dt, dh:dh + bh, :, :].reshape(bh * wp, cp)
         for dt in range(kt) for dh in range(kh)], axis=1)
    y = [jax.lax.dot_general(lhs, w_ref[dw], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
         .reshape(bh, wp, cout_blk)[:, dw:dw + w_out, :]
         for dw in range(kw)]
    acc = sum(y[1:], y[0]).astype(jnp.float32)
    out = acc * sv_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(1, bh, w_out, cout_blk).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def halo_conv3d_w8a8(x: jax.Array, w: jax.Array, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """W8A8 halo conv: per-tensor activation scale, per-output-channel
    weight scale, int8 MXU (2x the bf16 rate on v5e), f32 epilogue.

    Same contract as halo_conv3d. Quantization error is bounded by the
    quality harness (bench_quality VAE gate), not hidden: per-tensor
    activation quant of VAE decode activations is the coarsest recipe —
    tighten to per-row in-kernel if real-weight deltas demand it."""
    kt, kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "halo kernel is specialized to 3x3 spatial"
    tin, h, wdim, _ = x.shape
    t_out = tin - (kt - 1)
    # int8 VMEM tiles are (32, 128): Wp must cover whole 32-sublane tiles
    wp = -(-(wdim + kw - 1) // 32) * 32
    cout_blk = 128 if (cout > 128 and cout % 128 == 0) else cout
    n_co = cout // cout_blk
    c_pad = -(-cin // 128) * 128
    bh = _pick_bh(h, wp, c_pad, kt, kw, cout_blk, itemsize=1)
    n_h = -(-h // bh)
    h_pad = n_h * bh

    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (1, 1 + (h_pad - h)),
                      (1, wp - wdim - 1), (0, c_pad - cin)))

    wf = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    w2 = jnp.pad(wq, ((0, 0),) * 3 + ((0, c_pad - cin), (0, 0)))
    w2 = w2.transpose(2, 0, 1, 3, 4).reshape(kw, kt * kh * c_pad, cout)
    sv = (s_x * s_w).reshape(1, cout).astype(jnp.float32)
    b2 = b.reshape(1, cout).astype(jnp.float32)

    kern = functools.partial(
        _halo_conv_kernel_i8, kt=kt, kh=kh, kw=kw, bh=bh, w_out=wdim,
        n_h=n_h, n_t=t_out)
    out = pl.pallas_call(
        kern,
        grid=(t_out, n_h, n_co),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((kw, kt * kh * c_pad, cout_blk),
                         lambda t, hb, co: (0, 0, co)),
            pl.BlockSpec((1, cout_blk), lambda t, hb, co: (0, co)),
            pl.BlockSpec((1, cout_blk), lambda t, hb, co: (0, co)),
        ],
        out_specs=pl.BlockSpec((1, bh, wdim, cout_blk),
                               lambda t, hb, co: (t, hb, 0, co)),
        out_shape=jax.ShapeDtypeStruct((t_out, h_pad, wdim, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, bh + kh - 1, wp, c_pad), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(xp, w2, sv, b2)
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("interpret",))
def halo_conv3d(x: jax.Array, w: jax.Array, b: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Stride-1, spatial-SAME, temporal-VALID conv.

    x: [Tin, H, W, Cin] (Tin = T_out + kt - 1; batch handled by the caller)
    w: [kt, kh, kw, Cin, Cout] with kh == kw == 3
    b: [Cout]
    returns [T_out, H, W, Cout] in x.dtype.
    """
    kt, kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "halo kernel is specialized to 3x3 spatial"
    tin, h, wdim, _ = x.shape
    t_out = tin - (kt - 1)
    # Wp rounded to 16 sublanes: the halo DMA slices the HBM memref (Mosaic
    # requires tile-aligned slice extents on the sublane dim), and a
    # 16-multiple keeps the in-kernel [bh, wp, C] -> [bh*wp, C] bf16 merge
    # layout-free.
    wp = -(-(wdim + kw - 1) // 16) * 16
    # Mosaic requires the block's last dim be a multiple of 128 or the whole
    # array dim: block cout fully unless it's a large multiple of 128.
    cout_blk = 128 if (cout > 128 and cout % 128 == 0) else cout
    n_co = cout // cout_blk
    c_pad = -(-cin // 128) * 128
    bh = _pick_bh(h, wp, c_pad, kt, kw, cout_blk,
                  itemsize=jnp.dtype(x.dtype).itemsize)
    n_h = -(-h // bh)
    h_pad = n_h * bh
    # Cin rounded to the 128-lane tile: the halo DMA's source slice must
    # cover whole lane tiles. Zero input channels x zero weight rows
    # contribute nothing, and HBM storage is lane-padded regardless, so
    # this costs no bandwidth and keeps the conv exact.
    # one host-side pad: spatial halo + H rounded up to the block grid
    xp = jnp.pad(x, ((0, 0), (1, 1 + (h_pad - h)),
                     (1, wp - wdim - 1), (0, c_pad - cin)))

    # [kw, kt*kh*c_pad, cout]: K-folded per-dw weight panels matching the
    # kernel's im2col lane order (dt outer, dh inner)
    w2 = jnp.pad(w, ((0, 0),) * 3 + ((0, c_pad - cin), (0, 0)))
    w2 = w2.transpose(2, 0, 1, 3, 4).reshape(
        kw, kt * kh * c_pad, cout).astype(x.dtype)
    b2 = b.reshape(1, cout).astype(jnp.float32)

    kern = functools.partial(
        _halo_conv_kernel, kt=kt, kh=kh, kw=kw, bh=bh, w_out=wdim,
        n_h=n_h, n_t=t_out)
    out = pl.pallas_call(
        kern,
        grid=(t_out, n_h, n_co),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((kw, kt * kh * c_pad, cout_blk),
                         lambda t, hb, co: (0, 0, co)),
            pl.BlockSpec((1, cout_blk), lambda t, hb, co: (0, co)),
        ],
        out_specs=pl.BlockSpec((1, bh, wdim, cout_blk),
                               lambda t, hb, co: (t, hb, 0, co)),
        out_shape=jax.ShapeDtypeStruct((t_out, h_pad, wdim, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, bh + kh - 1, wp, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(xp, w2, b2)
    return out[:, :h]
