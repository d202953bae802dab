"""Native (orbax) parameter checkpoints.

The reference only ever loads torch formats (`core/checkpoint/
inference_loading.py`). Here torch checkpoints are CONVERTED once
(`utils/checkpoint.py` converters) and can then be persisted in JAX-native
form: orbax saves the param pytree (sharding-aware, async-capable, the
standard JAX deployment format), so production serving skips the torch
parse + layout transposes on every boot. Quantized leaves (int8/fp8 +
scales) round-trip as-is.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_FP8_TAG = "__fp8_e4m3__"


def save_params(path: str, params: Params) -> str:
    """Save a parameter pytree to an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # orbax/tensorstore lacks fp8 support in some versions: tag + upcast
    def enc(x):
        if getattr(x, "dtype", None) == jnp.float8_e4m3fn:
            return {_FP8_TAG: x.astype(jnp.float32)}
        return x

    tree = jax.tree.map(enc, params)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, target: Optional[Params] = None) -> Params:
    """Load a parameter pytree saved by save_params. `target` (a matching
    pytree of arrays or ShapeDtypeStructs) restores with the right
    shardings/dtypes when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        def enc(x):
            if getattr(x, "dtype", None) == jnp.float8_e4m3fn:
                return {_FP8_TAG: jax.ShapeDtypeStruct(x.shape, jnp.float32)}
            return jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                        getattr(x, "dtype", jnp.float32))

        tree = ckptr.restore(path, jax.tree.map(enc, target))
    else:
        tree = ckptr.restore(path)

    def dec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {_FP8_TAG}:
                return node[_FP8_TAG].astype(jnp.float8_e4m3fn)
            return {k: dec(v) for k, v in node.items()}
        return node

    return dec(tree)
