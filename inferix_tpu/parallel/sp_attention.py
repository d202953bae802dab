"""Sequence-parallel attention primitives: Ulysses all-to-all and ring
attention over the mesh's `sp` axis.

These are the TPU-native equivalents of the reference's hybrid SP stack
(`inferix/models/attention/distributed.py:53-712` CoreAttention: Ulysses
SeqAllToAll4D head<->sequence exchange + ring attention pass-q/pass-kv with
LSE merging, and `inferix/distributed/parallelism/context_parallel.py`
Ulysses all-to-all helpers):

* ulysses_attention — tokens sharded on `sp` are all-to-all'd so each device
  holds ALL tokens for H/sp heads, attends locally (full-KV flash), and
  all-to-all's back. One jax.lax.all_to_all each way over ICI; XLA overlaps
  the collectives with neighboring compute (the reference schedules this by
  hand in UlyssesScheduler).
* ring_attention — K/V rotate around the `sp` ring with jax.lax.ppermute
  while each device keeps its queries; partial outputs merge with the
  log-sum-exp trick (`distributed.py:30-48`). This is the pass-kv variant;
  memory per device is O(S/sp) for KV.

Both run inside shard_map and compose with the tp (head) axis: ulysses
requires heads % (sp*tp) == 0.

These are the STANDALONE primitives (full-sequence attention, no KV cache).
The production in-forward path — SP attention over the CACHED PREFIX inside
`block_forward`, with head-sharded/token-sharded caches and prefix-causal
masks — lives in `parallel/distributed_attention.py` and is what
`ParallelConfig.sp_mode` selects.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention_chunked, merge_attention_partials


# ---------------------------------------------------------------------------
# Ulysses
# ---------------------------------------------------------------------------

def _ulysses_body(q, k, v, kv_mask, axis_name: str):
    """Per-shard body. q/k/v: [B, S/sp, H, D] (local shard)."""
    sp = jax.lax.psum(1, axis_name)
    # heads -> devices, tokens gathered: [B, S/sp, H, D] -> [B, S, H/sp, D]
    def head_scatter(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    def head_gather(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    qg, kg, vg = head_scatter(q), head_scatter(k), head_scatter(v)
    out, _ = attention_chunked(qg, kg, vg, kv_mask=kv_mask)
    return head_gather(out)


def ulysses_attention(
    mesh: Mesh,
    q: jax.Array,   # [B, S, H, D] fully addressed (sharded on S over sp)
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence-parallel attention via head<->sequence all-to-all."""
    sp = mesh.shape["sp"]
    assert q.shape[2] % sp == 0, "heads must divide sp"
    in_specs = (
        P(None, "sp", None, None),
        P(None, "sp", None, None),
        P(None, "sp", None, None),
    )
    mask_spec = (P(None),) if kv_mask is not None else ()
    args = (q, k, v) + ((kv_mask,) if kv_mask is not None else ())

    def body(q_, k_, v_, *rest):
        m = rest[0] if rest else None
        return _ulysses_body(q_, k_, v_, m, "sp")

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=in_specs + mask_spec,
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# Ring (pass-kv)
# ---------------------------------------------------------------------------

def _ring_body(q, k, v, axis_name: str):
    """q/k/v: [B, S/sp, H, D] local shards. Rotate K/V around the ring,
    accumulate partials, merge with LSE."""
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(carry, _):
        k_cur, v_cur, outs, lses, i = carry
        out_i, lse_i = attention_chunked(q, k_cur, v_cur)
        outs = outs.at[i].set(out_i.astype(jnp.float32))
        lses = lses.at[i].set(lse_i)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, outs, lses, i + 1), None

    b, s_loc, h, d = q.shape
    outs0 = jnp.zeros((sp, b, s_loc, h, d), jnp.float32)
    lses0 = jnp.full((sp, b, h, s_loc), -jnp.inf, jnp.float32)
    (k_f, v_f, outs, lses, _), _ = jax.lax.scan(
        step, (k, v, outs0, lses0, 0), None, length=sp
    )
    out, _ = merge_attention_partials(outs, lses)
    return out.astype(q.dtype)


def ring_attention(
    mesh: Mesh,
    q: jax.Array,   # [B, S, H, D] sharded on S over sp
    k: jax.Array,
    v: jax.Array,
) -> jax.Array:
    """Bidirectional-bandwidth-friendly ring attention (pass-kv)."""
    return jax.shard_map(
        functools.partial(_ring_body, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Ring (pass-q): queries travel the ring while K/V stay resident — the
# reference's `ring_attention_forward_pass_q` (`distributed.py:373-561`),
# preferred when the KV (cache) is much larger than the query block, so the
# bytes on the wire are O(q) instead of O(kv).
# The (out, m, l) accumulator travels WITH the query; after sp hops the
# query returns home fully attended.
# ---------------------------------------------------------------------------

def _ring_pass_q_body(q, k, v, axis_name: str):
    sp = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    b, s_loc, h, d = q.shape

    def step(carry, _):
        q_cur, acc, m_run, l_run = carry
        out_i, lse_i = attention_chunked(q_cur, k, v)
        m_new = jnp.maximum(m_run, lse_i)
        w_old = jnp.exp(m_run - m_new)
        w_new = jnp.exp(lse_i - m_new)
        acc = acc * w_old.transpose(0, 2, 1)[..., None] \
            + out_i.astype(jnp.float32) * w_new.transpose(0, 2, 1)[..., None]
        l_new = l_run * w_old + w_new
        # rotate the query and its accumulator to the next rank
        q_nxt = jax.lax.ppermute(q_cur, axis_name, perm)
        acc = jax.lax.ppermute(acc, axis_name, perm)
        m_new = jax.lax.ppermute(m_new, axis_name, perm)
        l_new = jax.lax.ppermute(l_new, axis_name, perm)
        return (q_nxt, acc, m_new, l_new), None

    acc0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    (q_f, acc, m_f, l_f), _ = jax.lax.scan(
        step, (q, acc0, m0, l0), None, length=sp
    )
    # after sp hops everything is back at the home rank
    out = acc / jnp.maximum(l_f, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_pass_q(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
) -> jax.Array:
    return jax.shard_map(
        functools.partial(_ring_pass_q_body, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )(q, k, v)
