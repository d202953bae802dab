"""Max-free ("fixed-m") online softmax flash kernel experiment.

q/k are RMS-normed in the model, so logits are bounded: |s| <= D * gq*gk *
scale * log2e ~ 16.3*g^2 in the exp2 domain. fp32 has exponent range 2^+-126,
so p = exp2(s) without running-max subtraction cannot overflow/underflow for
any sane weights (safe while max|s| < ~100, i.e. gain products < ~6x unit).
That removes per-element VPU work: the max cross-lane reduce, the m-subtract
pass, and the acc/l correction multiplies — the kernel is VPU-bound, so this
is the figure of merit. Variants:
  - fixedm_lane: l kept as [q,128] per-lane partial sums (no cross-lane
    shuffle per block; single cross-lane reduce at finalize)
  - fixedm_full: l lane-replicated like the baseline
Also measures the int8-KV v2 kernel with the same treatment.
"""
import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from inferix_tpu.ops.flash_attention import (
    LOG2E, NEG_INF, _fit_block, _pad_to, flash_attention_prefix)

B, SQ, SKV, H, D = 1, 4680, 32760, 12, 128
N_ITER = 32


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


_null = None


def null_overhead():
    global _null
    if _null is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128))
        _sync(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(x))
            ts.append(time.perf_counter() - t0)
        _null = min(ts)
        print(f"# null overhead {_null*1e3:.2f} ms", flush=True)
    return _null


def timeit(fn, *args, n=N_ITER, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - null_overhead(), 1e-9) / n


def emit(name, **kw):
    line = json.dumps({"exp": name, **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


def _fixedm_kernel(bounds_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                   acc_ref, l_ref, *, kv_block, num_kv_blocks, num_heads,
                   lane_partial):
    ki = pl.program_id(2)
    batch = pl.program_id(0) // num_heads
    kv_start = bounds_ref[batch, 0]
    kv_len = bounds_ref[batch, 1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    block_start = ki * kv_block

    def _update(s):
        p = jnp.exp2(s)  # no max subtraction: fp32 range covers bounded logits
        if lane_partial:
            qb = p.shape[0]
            l_ref[...] += jnp.sum(
                p.reshape(qb, kv_block // 128, 128), axis=1)
        else:
            l_ref[...] += jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += pv

    def _logits():
        return jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    interior = (block_start >= kv_start) & (block_start + kv_block <= kv_len)

    @pl.when(interior)
    def _compute_interior():
        _update(_logits())

    @pl.when(jnp.logical_not(interior)
             & (block_start < kv_len) & (block_start + kv_block > kv_start))
    def _compute_boundary():
        s = _logits()
        col = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        _update(jnp.where((col >= kv_start) & (col < kv_len), s, NEG_INF))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        if lane_partial:
            l = jnp.sum(l_ref[...], axis=-1, keepdims=True)
        else:
            l = l_ref[...][:, :1]
        denom = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        lse = jnp.log2(denom) / LOG2E
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("q_block", "kv_block",
                                             "lane_partial"))
def fixedm_attention(q, k, v, kv_len, q_block=1024, kv_block=2048,
                     lane_partial=True):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d ** -0.5
    q_block = _fit_block(sq, q_block)

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = bh(q), bh(k), bh(v)
    qb = (qb.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qb = _pad_to(qb, 1, q_block)
    kb = _pad_to(kb, 1, kv_block)
    vb = _pad_to(vb, 1, kv_block)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    n_q, n_kv = sq_p // q_block, skv_p // kv_block

    bounds = jnp.stack([jnp.zeros((b,), jnp.int32),
                        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))],
                       axis=1)

    def q_map(bhi, qi, ki, bounds_ref):
        return (bhi, qi, 0)

    def kv_map(bhi, qi, ki, bounds_ref):
        bb = bhi // h
        first = bounds_ref[bb, 0] // kv_block
        last = jnp.maximum((bounds_ref[bb, 1] + kv_block - 1) // kv_block - 1,
                           first)
        return (bhi, jnp.clip(ki, first, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
            pl.BlockSpec((1, kv_block, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), q_map),
            pl.BlockSpec((1, q_block, 128), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, d), jnp.float32),
            pltpu.VMEM((q_block, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fixedm_kernel, kv_block=kv_block, num_kv_blocks=n_kv, num_heads=h,
        lane_partial=lane_partial)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(bounds, qb, kb, vb)
    return out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def main():
    key = jax.random.key(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, SQ, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, SKV, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, SKV, H, D), jnp.bfloat16)
    kv_len = jnp.int32(SKV)
    gf = 4 * B * H * SQ * SKV * D / 1e9

    # accuracy first: fixedm vs running-max baseline
    ref = flash_attention_prefix(q, k, v, kv_len)
    for lane in (True, False):
        got = fixedm_attention(q, k, v, kv_len, lane_partial=lane)
        err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        emit("fixedm_acc", lane_partial=lane, max_abs_err=float(err))

    def chain(fn):
        @jax.jit
        def run(c0):
            def body(c, _):
                o = fn(c)
                return (c + o * 1e-24).astype(c.dtype), None
            c, _ = jax.lax.scan(body, c0, None, length=N_ITER)
            return c
        return run

    variants = [
        ("baseline_runmax", lambda c: flash_attention_prefix(
            c, k, v, kv_len, kv_block=2048)),
        ("fixedm_lane_kv2048", lambda c: fixedm_attention(
            c, k, v, kv_len, kv_block=2048, lane_partial=True)),
        ("fixedm_full_kv2048", lambda c: fixedm_attention(
            c, k, v, kv_len, kv_block=2048, lane_partial=False)),
        ("fixedm_lane_kv1024", lambda c: fixedm_attention(
            c, k, v, kv_len, kv_block=1024, lane_partial=True)),
    ]
    for name, fn in variants:
        try:
            t = timeit(chain(fn), q)
            emit("fixedm", variant=name, ms=t * 1e3, tfs=gf / t / 1e3)
        except Exception as e:
            emit("fixedm", variant=name, error=repr(e)[:200])


if __name__ == "__main__":
    main()
