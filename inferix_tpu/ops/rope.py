"""3D rotary position embeddings for video DiT.

Semantics match the reference's complex-multiply rope
(`inferix/models/wan_base/components.py:34-103 rope_params/rope_apply` and the
start-frame-shifted `causal_rope_apply` in
`inferix/models/self_forcing/causal_model.py:33-100`), re-expressed as
real-valued cos/sin rotation so everything stays in XLA-friendly float32
(tables are built in float64 on host, applied in float32 on device).

Head-dim split across (t, h, w) axes: with c = head_dim // 2 the temporal axis
gets `c - 2*(c//3)` frequency pairs and each spatial axis gets `c//3`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RopeTables(NamedTuple):
    """Per-axis rotation angle tables, shape [max_seq_len, c_axis]."""

    t: jax.Array  # [max_pos, c_t]
    h: jax.Array  # [max_pos, c_h]
    w: jax.Array  # [max_pos, c_w]


def rope_axis_split(head_dim: int) -> Tuple[int, int, int]:
    c = head_dim // 2
    c_h = c // 3
    c_w = c // 3
    c_t = c - 2 * (c // 3)
    return c_t, c_h, c_w


def build_rope_tables(
    head_dim: int, max_pos: int = 1024, theta: float = 10000.0
) -> RopeTables:
    """Angle tables theta_j(p) = p * theta^(-2j/d_axis), float64 on host."""
    assert head_dim % 2 == 0
    c_t, c_h, c_w = rope_axis_split(head_dim)

    def table(c_axis: int) -> np.ndarray:
        # matches reference rope_params: dim = 2*c_axis, exponent arange(0, dim, 2)/dim
        dim = 2 * c_axis
        inv = 1.0 / np.power(
            theta, np.arange(0, dim, 2, dtype=np.float64) / dim
        )
        ang = np.outer(np.arange(max_pos, dtype=np.float64), inv)
        return ang

    return RopeTables(
        t=jnp.asarray(table(c_t), dtype=jnp.float32),
        h=jnp.asarray(table(c_h), dtype=jnp.float32),
        w=jnp.asarray(table(c_w), dtype=jnp.float32),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rope_angles(
    tables: RopeTables,
    f: int,
    h: int,
    w: int,
    start_frame: jax.Array | int = 0,
) -> jax.Array:
    """Per-token rotation angles for an (f, h, w) latent grid.

    start_frame shifts the temporal axis (semi-AR blocks carry absolute frame
    positions; reference `causal_rope_apply` start_frame argument).

    Returns [f*h*w, head_dim//2] float32.
    """
    start = jnp.asarray(start_frame, dtype=jnp.int32)
    frame_idx = start + jnp.arange(f, dtype=jnp.int32)
    ang_t = tables.t[frame_idx]                      # [f, c_t]
    ang_h = tables.h[:h]                             # [h, c_h]
    ang_w = tables.w[:w]                             # [w, c_w]

    c_t, c_h, c_w = ang_t.shape[-1], ang_h.shape[-1], ang_w.shape[-1]
    out = jnp.concatenate(
        [
            jnp.broadcast_to(ang_t[:, None, None, :], (f, h, w, c_t)),
            jnp.broadcast_to(ang_h[None, :, None, :], (f, h, w, c_h)),
            jnp.broadcast_to(ang_w[None, None, :, :], (f, h, w, c_w)),
        ],
        axis=-1,
    )
    return out.reshape(f * h * w, c_t + c_h + c_w)


# Global rope implementation switch (trace-time static; pipelines set it
# from RuntimeConfig.rope_mxu at init). "pairs" is the original interleaved
# even/odd formulation; "mxu" computes the identical rotation as
# x*cosF + (x@R)*sinF with a constant +-1 rotation matrix R [D, D] — the
# pair shuffle becomes a tiny MXU matmul instead of a [.., D//2, 2]
# reshape, which XLA lays out as T(2,128) and burns ~3 ms/forward on at
# the 1.3B shape (exp/r6_results/op_breakdown.log
# %subtract_convert_fusion.3).
_ROPE_IMPL = "pairs"


def set_rope_impl(impl: str) -> None:
    global _ROPE_IMPL
    assert impl in ("pairs", "mxu")
    _ROPE_IMPL = impl


@functools.lru_cache(maxsize=8)
def _rope_rotation_matrix(d: int) -> np.ndarray:
    """R such that (x @ R)[2j] = -x[2j+1], (x @ R)[2j+1] = x[2j].

    Cached as HOST numpy (a jnp constant created inside a trace would be
    cached as a tracer and leak into later traces); jnp.asarray at the use
    site embeds it as a compile-time constant.
    """
    r = np.zeros((d, d), np.float32)
    for j in range(d // 2):
        r[2 * j + 1, 2 * j] = -1.0
        r[2 * j, 2 * j + 1] = 1.0
    return r


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate adjacent (even, odd) pairs of the head dim.

    x: [..., S, H, D]; angles: [S, D//2]. Matches the reference's
    view_as_complex pairing (pairs are interleaved, not split-half).
    Computation in float32, result cast back to x.dtype.
    """
    orig_dtype = x.dtype
    *lead, s, nh, d = x.shape
    if _ROPE_IMPL == "mxu":
        # out[2j]   = x[2j]*cos - x[2j+1]*sin
        # out[2j+1] = x[2j]*sin + x[2j+1]*cos
        # == x * cosF + (x @ R) * sinF with cos/sin repeated per pair.
        # The +-1 matmul extracts the partner values EXACTLY (f32
        # accumulation of single +-bf16 terms), so the arithmetic matches
        # the pairs formulation term for term.
        # [..., S, 1, D] — angles may carry leading batch dims (continuous
        # batching passes per-stream angle tables), same broadcast as the
        # pairs path below
        cosf = jnp.repeat(jnp.cos(angles), 2, axis=-1)[..., :, None, :]
        sinf = jnp.repeat(jnp.sin(angles), 2, axis=-1)[..., :, None, :]
        xr = jax.lax.dot_general(
            x, jnp.asarray(_rope_rotation_matrix(d), x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = x.astype(jnp.float32) * cosf + xr * sinf
        return out.astype(orig_dtype)
    xf = x.astype(jnp.float32)
    xf = xf.reshape(*lead, s, nh, d // 2, 2)
    x_even = xf[..., 0]
    x_odd = xf[..., 1]
    cos = jnp.cos(angles)[..., :, None, :]  # [S, 1, D//2]
    sin = jnp.sin(angles)[..., :, None, :]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(*lead, s, nh, d)
    return out.astype(orig_dtype)


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """Sinusoidal timestep embedding; [cos | sin] layout as the reference
    (`components.py:11-31`). Returns float32 [..., dim]."""
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(
        10000.0, -jnp.arange(half, dtype=jnp.float32) / half
    )
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)
