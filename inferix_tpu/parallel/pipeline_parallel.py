"""Real pipeline parallelism over the mesh `pp` axis.

The reference implements PP as async isend/irecv of activations between
layer-range stages (`inferix/distributed/parallelism/pipeline_parallel.py:
16-109` PPScheduler) kept busy by MAGI's work queue of in-flight requests
(`inferix/pipeline/magi/video_generate.py:723-756`).

TPU-native equivalent — a GPipe-style microbatched forward inside one
`shard_map` over `pp`:

* the stacked layer axis [L, ...] (params AND per-layer state such as the
  KV cache) is SHARDED over `pp`, so each stage holds and computes ONLY its
  own L/pp layers — stage-local compute, no `jnp.where(mine, ...)`
  both-sides evaluation;
* microbatches stream through the stages; each tick every stage runs its
  local layer scan on the microbatch it holds and hands the activation to
  the next stage with a single neighbor `ppermute` (the isend/irecv pair,
  riding ICI);
* warmup/drain bubble ticks run `lax.cond` pass-through — a stage that
  holds no valid microbatch skips its layer compute entirely;
* per-layer state updates are committed only on valid ticks, so bubble
  garbage never reaches the KV cache.

With M microbatches and pp stages the schedule takes M + pp - 1 ticks and
each device performs exactly M * (L/pp) layer applications — total layer
FLOPs do NOT scale with pp (the round-1 `pp_scan_layers` evaluated every
stage's layers on every device; it is replaced by this).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pp_pipeline(
    mesh: Mesh,
    layer_fn: Callable[..., Tuple[Any, Any]],
    stacked_params: Any,        # pytree, leading L axis (L % pp == 0)
    microbatches: Any,          # pytree, leading M axis: layer-0 activations
    layer_state: Any = None,    # optional pytree, leading L axis
    pass_mb_index: bool = False,
    compose_auto: bool = False,
) -> Tuple[Any, Any]:
    """Run every microbatch through all L layers, layers sharded over pp.

    layer_fn(params_slice, state_slice, x[, mb_idx]) -> (x_out,
    new_state_slice) applies ONE layer (slices have no leading L axis;
    state_slice is None when layer_state is None; mb_idx — the traced
    microbatch index — is passed when pass_mb_index, letting per-microbatch
    rows of a shared state be addressed, e.g. KV-cache batch slots).
    x / microbatches may be any pytree. Returns (outputs with leading M,
    updated layer_state).

    compose_auto: run the pipeline PARTIALLY manual — manual over 'pp'
    only, with the mesh's other axes (tp, sp, dp) left to GSPMD inside the
    stage body. This is the composed 24B serving layout (tp4 x pp2 /
    tp2 x sp2 x pp2, BASELINE.md per-chunk AOT table): each stage's layer
    weights stay tensor-sharded over tp (magi_param_pspecs), the stage
    matmuls are auto-partitioned, and layer_fn may open its own nested
    shard_map islands over (tp, sp) for the attention kernels (the islands
    detect the manual-pp context via _island_shard_map). The default
    (False) keeps the original fully-manual behavior where non-pp axes are
    replicated inside the body.
    """
    pp = mesh.shape["pp"]
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert num_layers % pp == 0, (num_layers, pp)
    m = jax.tree.leaves(microbatches)[0].shape[0]
    has_state = layer_state is not None

    def call_layer(p_, s_, h, mb_idx):
        if pass_mb_index:
            return layer_fn(p_, s_, h, mb_idx)
        return layer_fn(p_, s_, h)

    def tmap(f, *trees):
        return jax.tree.map(f, *trees)

    def mb_at(mb, t):
        return tmap(lambda a: jax.lax.dynamic_index_in_dim(
            a, jnp.clip(t, 0, m - 1), 0, keepdims=False), mb)

    if pp == 1:
        outs = []
        state = layer_state
        for i in range(m):
            def one(carry, ps):
                h, s_all_unused = carry
                if has_state:
                    p_, s_ = ps
                else:
                    p_, s_ = ps, None
                h2, s2 = call_layer(p_, s_, h, jnp.int32(i))
                return (h2, None), s2

            x_i = tmap(lambda a: a[i], microbatches)
            if has_state:
                (h, _), state = jax.lax.scan(one, (x_i, None),
                                             (stacked_params, state))
            else:
                (h, _), _ = jax.lax.scan(one, (x_i, None), stacked_params)
            outs.append(h)
        outs = tmap(lambda *xs: jnp.stack(xs), *outs)
        return outs, state

    def body(p_loc, s_loc, mb):
        # p_loc/s_loc: this stage's [L/pp, ...] slices; mb: [M, ...] (full)
        stage = jax.lax.axis_index("pp")
        n_ticks = m + pp - 1
        fwd = [(i, i + 1) for i in range(pp - 1)]

        def run_local(x_in, s_in, mb_idx):
            def one(carry, ps):
                h = carry
                if has_state:
                    p_, s_ = ps
                else:
                    p_, s_ = ps, None
                h2, s2 = call_layer(p_, s_, h, mb_idx)
                return h2, s2

            if has_state:
                return jax.lax.scan(one, x_in, (p_loc, s_in))
            h, _ = jax.lax.scan(one, x_in, p_loc)
            return h, s_in

        def tick(carry, t):
            act_in, s_cur, outs = carry
            # stage 0 injects microbatch t; others use the handed activation
            mb_t = mb_at(mb, t)
            x_in = tmap(lambda a, b: jnp.where(stage == 0, a, b),
                        mb_t, act_in)
            # this stage holds microbatch (t - stage); valid while in range
            mb_idx = t - stage
            valid = (mb_idx >= 0) & (mb_idx < m)

            def compute(args):
                x_, s_ = args
                return run_local(x_, s_, jnp.clip(mb_idx, 0, m - 1))

            def skip(args):
                return args

            x_out, s_new = jax.lax.cond(valid, compute, skip, (x_in, s_cur))
            # commit state only on valid ticks (bubble garbage never lands)
            if has_state:
                s_cur = jax.tree.map(
                    lambda new, old: jnp.where(valid, new, old), s_new, s_cur)
            # hand to the next stage (stage pp-1's output is collected below)
            act_next = jax.lax.ppermute(x_out, "pp", fwd)
            out_idx = t - (pp - 1)
            write = (stage == pp - 1) & (out_idx >= 0)
            outs = tmap(
                lambda o, x_: jnp.where(
                    write,
                    jax.lax.dynamic_update_index_in_dim(
                        o, x_, jnp.clip(out_idx, 0, m - 1), 0),
                    o),
                outs, x_out,
            )
            return (act_next, s_cur, outs), None

        zeros_act = tmap(lambda a: jnp.zeros_like(a[0]), mb)
        outs0 = tmap(jnp.zeros_like, mb)
        (_, s_fin, outs), _ = jax.lax.scan(
            tick, (zeros_act, s_loc, outs0),
            jnp.arange(n_ticks, dtype=jnp.int32))
        # outputs live on the last stage; broadcast to every stage
        outs = tmap(
            lambda o: jax.lax.psum(
                jnp.where(stage == pp - 1, o, jnp.zeros_like(o)), "pp"),
            outs)
        return outs, s_fin

    p_specs = jax.tree.map(lambda _: P("pp"), stacked_params)
    s_specs = jax.tree.map(lambda _: P("pp"), layer_state) if has_state \
        else None
    smap_kw = dict(mesh=mesh, check_vma=False)
    if compose_auto:
        # manual over pp only; tp/sp/dp stay GSPMD-auto inside the body
        smap_kw["axis_names"] = {"pp"}
    if not has_state:
        # shard_map needs concrete args; thread a dummy state
        def body_nostate(p_loc, mb):
            return body(p_loc, None, mb)[0]

        outs = jax.shard_map(
            body_nostate,
            in_specs=(p_specs, P()),
            out_specs=P(),
            **smap_kw,
        )(stacked_params, microbatches)
        return outs, None

    outs, new_state = jax.shard_map(
        body,
        in_specs=(p_specs, s_specs, P()),
        out_specs=(P(), s_specs),
        **smap_kw,
    )(stacked_params, layer_state, microbatches)
    return outs, new_state


def pp_scan_layers(
    mesh: Mesh,
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
) -> jax.Array:
    """Single-activation convenience wrapper over pp_pipeline (one
    microbatch; the pipeline degenerates to sequential stages but compute
    stays stage-local)."""
    outs, _ = pp_pipeline(
        mesh,
        lambda p, s, h: (layer_fn(p, h), s),
        stacked_params,
        x[None],
    )
    return outs[0]
