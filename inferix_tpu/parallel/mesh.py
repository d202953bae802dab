"""Device mesh + sharding rules.

One `jax.sharding.Mesh` with axes (dp, sp, tp, pp) replaces the reference's
three process-group stacks (Megatron-style `inferix/distributed/parallel_state.py`,
xfuser/yunchang groups in `models/self_forcing/wrapper.py:191-206`). All
parallelism is expressed as NamedSharding annotations — XLA GSPMD inserts the
collectives (all-gather / reduce-scatter over ICI) that the reference issues
by hand through NCCL.

Axis meaning:
  dp — data parallel: independent requests/streams (continuous batching)
  sp — sequence parallel: tokens within a frame's HW grid (context parallel)
  tp — tensor parallel: attention heads / ffn hidden
  pp — pipeline stages over layer ranges (optional)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ParallelConfig

AXES = ("dp", "sp", "tp", "pp")


def make_mesh(
    cfg: ParallelConfig, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = cfg.dp * cfg.sp * cfg.tp * cfg.pp
    if len(devices) < need:
        raise ValueError(
            f"Parallel config needs {need} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(cfg.dp, cfg.sp, cfg.tp, cfg.pp)
    return Mesh(grid, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1), AXES)


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree for the causal-DiT parameter pytree.

    Tensor-parallel layout (Megatron-style column/row split, which the
    reference reserves but never implements — SURVEY.md §2.1 notes TP groups
    exist with no TP layers; here it is real):
      qkv projections: output dim over tp (head-sharded)
      o projection:    input dim over tp
      ffn fc1:         output dim over tp; fc2: input dim over tp
    Block params carry a leading stacked-layer axis L (unsharded).
    """

    def spec_for(path: str, leaf) -> P:
        nd = leaf.ndim
        if "blocks" in path:
            # leading stacked-layer axis shards over pp (pipeline stages)
            if path.endswith("/w"):
                if any(f"/{n}/w" in path for n in ("q", "k", "v", "qkv")) and "ffn" not in path:
                    return P("pp", None, "tp")
                if "/o/w" in path:
                    return P("pp", "tp", None)
                if "/fc1/w" in path:
                    return P("pp", None, "tp")
                if "/fc2/w" in path:
                    return P("pp", "tp", None)
                return P(*(["pp"] + [None] * (nd - 1)))
            if path.endswith("/b"):
                if "/fc1/b" in path:
                    return P("pp", "tp")
                if any(f"/{n}/b" in path for n in ("q", "k", "v", "qkv")) and "ffn" not in path:
                    return P("pp", "tp")
                return P(*(["pp"] + [None] * (nd - 1)))
            return P(*(["pp"] + [None] * (nd - 1)))
        return P(*([None] * nd))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return spec_for(path, tree)

    return walk(params)


def kv_cache_pspec(head_major: bool = False) -> P:
    """[L, B, S, H, D]: layers over pp, batch over dp, heads over tp
    (head-major [L, B, H, S, D] caches shard the leading head axis)."""
    if head_major:
        return P("pp", "dp", "tp", None, None)
    return P("pp", "dp", None, "tp", None)


def wan_kv_cache_pspec(sp_mode: str = "none", head_major: bool = False,
                       quantized_field: bool = False) -> P:
    """At-rest sharding for the Wan engine's KV cache, matched to the SP
    island that reads it so the carried cache never reshards between
    forwards (ulysses: heads over the combined (tp, sp); ring: tokens
    over sp, heads over tp; no island: heads over tp). Layers always ride
    pp (size-1 axes are no-ops). Value fields are [L, B, S, H, D]
    ([L, B, H, S, D] head-major); quantized_field selects the 4-dim
    scale layout."""
    if sp_mode == "ulysses":
        heads = ("tp", "sp")
        tokens = None
    elif sp_mode in ("ring", "ring_pass_q"):
        heads = "tp"
        tokens = "sp"
    else:
        heads = "tp"
        tokens = None
    if head_major:
        axes = ["pp", "dp", heads, tokens]
    else:
        axes = ["pp", "dp", tokens, heads]
    if not quantized_field:
        axes.append(None)
    return P(*axes)


def xattn_cache_pspec() -> P:
    """[L, B, text_len, H, D]: layers over pp, batch over dp, heads over tp."""
    return P("pp", "dp", None, "tp", None)


def latent_pspec() -> P:
    """[B, F, H, W, C]: batch over dp, spatial rows over sp."""
    return P("dp", None, "sp", None, None)


def rng_pspec() -> P:
    return P()


def to_named(tree, mesh: Mesh):
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh):
    shardings = to_named(param_pspecs(params), mesh)
    return jax.device_put(params, shardings)


def magi_param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree for the MAGI VideoDiT parameter pytree.

    Megatron-style tensor layout over `tp` (the 24B serving plan: int8
    weights tp-sharded — params_gib/chip = total/tp):
      q/qx/k/v and kv_xattn: output dim over tp (head-sharded; kv_xattn's
        out dim is group-major [g, k|v, hd] so tp shards kv groups)
      proj: input dim over tp (group-major interleave)
      fc1 (+ fc1_up): output dim over tp; fc2: input dim over tp
      (gated configs run the gate/up-SEPARATE layout — split_gated_fc1 —
       so silu*mul is shard-local; the concatenated [gate|up] layout under
       tp makes GSPMD insert cross-shard collective-permutes that deadlock
       the partially-manual pp pipeline, exp/r17_pp_compose_bisect.py)
    Stacked containers ("blocks", "blocks_mid") carry a leading layer axis
    sharded over pp; the fp8-split edge layers ("blocks_first"/"_last")
    have no layer axis. int8/fp8 quant leaves: w_q like w, per-out-channel
    scales over tp.
    """
    def spec_for(path: str, leaf) -> P:
        nd = leaf.ndim
        stacked = "/blocks/" in path or "/blocks_mid/" in path
        in_block = stacked or "/blocks_first/" in path \
            or "/blocks_last/" in path
        lead = ["pp"] if stacked else []
        body = None
        if not in_block:
            # embedders / final head stay replicated (tiny matmuls; the
            # t_embedder's fc1/fc2 must NOT be tp-sharded — cond_dim need
            # not divide tp)
            return P(*([None] * nd))
        if path.endswith("/w") or path.endswith("/w_q"):
            if any(f"/{n}/" in path for n in ("q", "qx", "k", "v",
                                              "kv_xattn", "fc1", "fc1_up")):
                body = [None, "tp"]
            elif any(f"/{n}/" in path for n in ("proj", "fc2")):
                body = ["tp", None]
        elif path.endswith("/scale") or path.endswith("/weight_scale"):
            if any(f"/{n}/" in path for n in ("q", "qx", "k", "v",
                                              "kv_xattn", "fc1", "fc1_up")):
                body = ["tp"] if nd - len(lead) == 1 else None
        if body is not None and len(lead) + len(body) == nd:
            return P(*(lead + body))
        return P(*(lead + [None] * (nd - len(lead))))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return spec_for(path, tree)

    return walk(params)


def magi_kv_cache_pspec(quantized_field: bool = False,
                        head_major: bool = False,
                        pp: bool = False) -> P:
    """MAGI window cache [L, B, S, Hkv, D]: kv heads over the COMBINED
    (tp, sp) axis (matching the CSO island's effective head sharding);
    scales [L, B, S, Hkv] likewise. head_major: [L, B, Hkv, S, D] /
    [L, B, Hkv, S] — the shard axis moves with the heads. pp: the layer
    axis shards over the pipeline stages (the composed tp x pp 24B
    deployment — magi_forward_pp's layer_state rides the same layout)."""
    lead = "pp" if pp else None
    if head_major:
        return (P(lead, "dp", ("tp", "sp"), None) if quantized_field
                else P(lead, "dp", ("tp", "sp"), None, None))
    if quantized_field:
        return P(lead, "dp", None, ("tp", "sp"))
    return P(lead, "dp", None, ("tp", "sp"), None)
