"""Mid-generation state checkpointing ("persistent world state").

The reference has NO generation-state persistence — only model-weight loading
and the overlap-latent carry between segments (SURVEY.md §5 checkpoint/resume;
the reference README lists persistent world state as roadmap). Here a running
world-simulation stream can be snapshotted and resumed exactly:

  snapshot = save_generation_state(path, cache=..., frames_done=..., rng=...,
                                   latents=...)
  state = load_generation_state(path)

The KV cache, per-stream positions, rng keys, and trailing latents round-trip
through one compressed npz (keys flattened with '/' joins; jax key arrays are
serialized via jax.random.key_data). Resuming continues the stream bit-for-bit
where it stopped — including across process restarts.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif v is None:
            out[f"{key}__none"] = np.zeros(0, np.uint8)
        elif hasattr(v, "dtype") and jnp.issubdtype(getattr(v, "dtype", None),
                                                    jax.dtypes.prng_key):
            out[f"{key}__prngkey"] = np.asarray(jax.random.key_data(v))
        elif hasattr(v, "shape"):
            if getattr(v, "dtype", None) == jnp.float8_e4m3fn:
                # fp8 KV cache: round-trip via f32 (exact — f32 superset)
                out[f"{key}__fp8"] = np.asarray(
                    jnp.asarray(v, jnp.float32))
                continue
            arr = np.asarray(v)
            if arr.dtype == jnp.bfloat16:
                out[f"{key}__bf16"] = arr.astype(np.float32)
            else:
                out[key] = arr
        else:
            out[f"{key}__scalar"] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        if key.endswith("__none"):
            key, val = key[: -len("__none")], None
        elif key.endswith("__prngkey"):
            key = key[: -len("__prngkey")]
            val = jax.random.wrap_key_data(jnp.asarray(arr))
        elif key.endswith("__bf16"):
            key = key[: -len("__bf16")]
            val = jnp.asarray(arr, jnp.bfloat16)
        elif key.endswith("__fp8"):
            key = key[: -len("__fp8")]
            val = jnp.asarray(arr, jnp.float8_e4m3fn)
        elif key.endswith("__scalar"):
            key = key[: -len("__scalar")]
            val = arr.item() if arr.ndim == 0 else arr
        else:
            val = jnp.asarray(arr)
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_generation_state(path: str, **state: Any) -> str:
    """Persist named pytrees (cache, latents, rng, positions...) to one npz."""
    flat = _flatten({k: (v._asdict() if hasattr(v, "_asdict") else v)
                     for k, v in state.items()})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_generation_state(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})
