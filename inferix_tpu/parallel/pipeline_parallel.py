"""Pipeline parallelism over the mesh `pp` axis.

The reference implements PP as async isend/irecv of activations between layer-
range stages (`inferix/distributed/parallelism/pipeline_parallel.py:16-109`)
with MAGI's work queue overlapping stages (`video_generate.py:729-756`).

TPU-native equivalent: the stacked layer axis [L, ...] is SHARDED over `pp`;
inside shard_map each stage scans its local L/pp layers and the activation
hops stages with a single jax.lax.ppermute per stage step (ICI neighbor
exchange — the isend/irecv pair). With a stream of inputs (microbatches /
work-queue items), consecutive items occupy consecutive stages and the ring
stays full — XLA overlaps each stage's compute with its neighbor transfer.

`pp_scan_layers` is the building block: given per-layer apply + stage-sharded
stacked params, it runs the full depth across stages for a batch of
activations, optionally pipelining a leading microbatch axis.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pp_scan_layers(
    mesh: Mesh,
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,       # pytree with leading L axis (L % pp == 0)
    x: jax.Array,              # [B, ...] activations entering layer 0
) -> jax.Array:
    """Run x through all L layers with the layer axis sharded over pp.

    layer_fn(params_slice, x) -> x applies ONE layer (params_slice has no
    leading axis). Returns the output of the final layer, replicated.
    """
    pp = mesh.shape["pp"]
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert num_layers % pp == 0, (num_layers, pp)

    def body(params_local, x_in):
        # params_local: local L/pp slice of the stacked params
        stage = jax.lax.axis_index("pp")
        fwd_perm = [(i, (i + 1) % pp) for i in range(pp)]

        def run_local(h):
            def one(h_, p_):
                return layer_fn(p_, h_), None

            h_, _ = jax.lax.scan(one, h, params_local)
            return h_

        # stage s computes during step s, then passes on; other stages carry
        # the activation through untouched.
        h = x_in

        def step(h_c, s):
            mine = jax.lax.axis_index("pp") == s
            h_n = jnp.where(mine, run_local(h_c), h_c)
            h_n = jax.lax.ppermute(h_n, "pp", fwd_perm)
            return h_n, None

        h, _ = jax.lax.scan(step, h, jnp.arange(pp))
        # after pp hops the result is back at stage 0; broadcast to all
        h = jax.lax.all_gather(h, "pp")[0]
        return h

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, x)
