"""Quantization API: qconfig-driven weight quantization + quantized linear.

Replaces the reference's two quantization mechanisms with one in-repo module
(SURVEY.md §5 "Quantization"):
* DAX dynamic quant for the Wan family — qconfig dict applied post-load with
  module-name opt-outs (`example/quantization/run_self_forcing_quantized.py:33-65`)
* MAGI built-in FP8 linears (`dit_module.py:367-490`)

Recipes:
  int8 per_channel: dynamic per-token activation absmax x per-channel weight
                    (the DAX W8A8 recipe; no calibration needed)
  int8 per_tensor:  per-tensor weight scale, dynamic per-token activation
  fp8:              e4m3 weights (memory format; bf16 MXU compute on v5e)

`quantize_params` walks the causal-DiT parameter pytree and replaces each
eligible linear's {"w", "b"} with {"w_q", "scale", "b"}; the model's `linear`
dispatches on the presence of "w_q".
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core.config import QuantConfig
from .kernels import (
    fp8_matmul,
    fp8_matmul_xla,
    int8_matmul,
    int8_matmul_xla,
    quantize_act_int8_per_token,
    quantize_weight_fp8,
    quantize_weight_int8,
)

Params = Dict[str, Any]

# parameter paths (substring match) that hold quantizable linears inside the
# stacked transformer blocks
_BLOCK_LINEARS = (
    "self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
    "cross_attn/q", "cross_attn/k", "cross_attn/v", "cross_attn/o",
    "ffn/fc1", "ffn/fc2",
)

# Fused one-pass activation quantization (ops/act_quant.py Pallas kernel).
# Engine-level switch (static at trace time): the XLA chain materializes
# extra HBM passes around every dynamic per-token quant — ~14 ms/forward at
# the 1.3B fc2 input alone (exp/r6_results/op_breakdown.log %fusion.317/318).
# Pipelines set this from QuantConfig.fused_act_quant at init.
_FUSED_ACT_QUANT = False
_FUSED_ACT_QUANT_INTERPRET = False


def set_fused_act_quant(enabled: bool, interpret: bool = False) -> None:
    global _FUSED_ACT_QUANT, _FUSED_ACT_QUANT_INTERPRET
    _FUSED_ACT_QUANT = enabled
    _FUSED_ACT_QUANT_INTERPRET = interpret


def fused_act_quant_on() -> bool:
    return _FUSED_ACT_QUANT


def apply_act(x2: jax.Array, act: Optional[str]) -> jax.Array:
    """The XLA activation chains the fused kernel folds (exact fallbacks)."""
    if act is None:
        return x2
    if act == "gelu":
        return jax.nn.gelu(x2, approximate=True)
    if act == "gelu_exact":
        return jax.nn.gelu(x2, approximate=False)
    if act == "silu_mul":
        d = x2.shape[-1] // 2
        return (jax.nn.silu(x2[..., :d].astype(jnp.float32))
                .astype(x2.dtype) * x2[..., d:])
    raise ValueError(f"unknown act {act!r}")


def _fused_active() -> bool:
    """The fused kernel runs only where Pallas can: on the TPU backend, or
    anywhere in interpret mode (tests). CPU runs with the flag set fall
    back to the XLA chain instead of failing to lower."""
    return _FUSED_ACT_QUANT and (
        _FUSED_ACT_QUANT_INTERPRET or jax.default_backend() == "tpu")


def _quantize_act(x2: jax.Array, act: Optional[str] = None):
    """Per-token int8 quant of [M, K] activations, optional pre-activation."""
    out_k = x2.shape[-1] // 2 if act == "silu_mul" else x2.shape[-1]
    if (_fused_active() and x2.shape[-1] % 128 == 0 and out_k % 128 == 0):
        from ..ops.act_quant import quantize_rows_int8

        return quantize_rows_int8(
            x2, act=act, interpret=_FUSED_ACT_QUANT_INTERPRET
        )
    return quantize_act_int8_per_token(apply_act(x2, act))


def quantized_linear(p: Params, x: jax.Array, use_pallas: Optional[bool] = None
                     ) -> jax.Array:
    """x: [..., K] with p = {"w_q", "scale", "b"}. Returns [..., N].

    Path selection (measured on v5e): XLA's native int8 dot_general +
    fused scale epilogue beats the standalone Pallas matmul because XLA
    fuses the dynamic activation quantization and the dequant epilogue into
    the surrounding elementwise ops (no extra HBM round-trips); the Pallas
    kernels remain available for explicit-control experiments.
    """
    if use_pallas is None:
        use_pallas = False
    *lead, k = x.shape
    x2 = x.reshape(-1, k)
    w_q, scale = p["w_q"], p["scale"]
    if w_q.dtype == jnp.int8:
        x_q, x_scale = _quantize_act(x2)
        if use_pallas:
            out = int8_matmul(x_q, w_q, x_scale, scale, out_dtype=x.dtype)
        else:
            acc = jax.lax.dot_general(
                x_q, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = (acc.astype(jnp.float32) * x_scale.astype(jnp.float32)
                   * scale.astype(jnp.float32).reshape(1, -1)).astype(x.dtype)
    else:  # fp8 weights (memory format; bf16 compute)
        if use_pallas:
            out = fp8_matmul(x2, w_q, scale, out_dtype=x.dtype)
        else:
            wf = w_q.astype(x.dtype)
            out = (jnp.dot(x2, wf).astype(jnp.float32)
                   * scale.astype(jnp.float32).reshape(1, -1)).astype(x.dtype)
    out = out + p["b"].astype(out.dtype)
    return out.reshape(*lead, out.shape[-1])


def use_fused_prologue(p: Params, x: jax.Array) -> bool:
    """True when the fused LN[/modulate]+quant prologue can feed linear p."""
    return (_fused_active() and isinstance(p, dict) and "w_q" in p
            and p["w_q"].dtype == jnp.int8 and x.shape[-1] % 128 == 0)


def adaln_quant(x, shift, scale_mod, eps):
    """Fused LN+modulate+quant prologue (threads the interpret flag)."""
    from ..ops.act_quant import adaln_quantize_rows_int8

    return adaln_quantize_rows_int8(
        x, shift, scale_mod, eps=eps, interpret=_FUSED_ACT_QUANT_INTERPRET)


def ln_quant(x2, weight, bias, eps):
    """Fused LN(+affine)+quant prologue (threads the interpret flag)."""
    from ..ops.act_quant import ln_quantize_rows_int8

    return ln_quantize_rows_int8(
        x2, weight, bias, eps=eps, interpret=_FUSED_ACT_QUANT_INTERPRET)


def quantized_linear_prequant(
    p: Params, x_q: jax.Array, x_scale: jax.Array, out_dtype
) -> jax.Array:
    """int8 linear with a pre-quantized input (from a fused prologue).

    x_q: [..., K] int8; x_scale: [..., 1] f32 per-token. Same dequant
    epilogue as quantized_linear's XLA path.
    """
    *lead, k = x_q.shape
    acc = jax.lax.dot_general(
        x_q.reshape(-1, k), p["w_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * x_scale.reshape(-1, 1).astype(jnp.float32)
           * p["scale"].astype(jnp.float32).reshape(1, -1)).astype(out_dtype)
    out = out + p["b"].astype(out.dtype)
    return out.reshape(*lead, out.shape[-1])


def quantized_ffn(
    fc1: Params, fc2: Params, x: Optional[jax.Array] = None,
    x_q: Optional[jax.Array] = None, x_scale: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """fc2(gelu(fc1(x))) with the gelu folded into fc2's activation quant.

    With the fused act-quant enabled and int8 fc2 weights, the gelu runs
    inside the one-pass quant kernel (ops/act_quant.py act="gelu"), so the
    bf16 gelu tensor — the largest activation in the block, [M, ffn_dim] —
    is never written to HBM between the two matmuls. Falls back to the
    plain chain (bit-identical to quantized_linear(fc2, gelu(fc1(x))))
    whenever the fused path is off or fc2 isn't int8. Reference analog:
    DAX fuses the same dynamic-quant epilogue on GPU.
    """
    if x_q is not None:
        # input arrives pre-quantized from the fused AdaLN prologue
        h = quantized_linear_prequant(fc1, x_q, x_scale, out_dtype)
    elif "w_q" in fc1:
        h = quantized_linear(fc1, x)
    else:
        h = jnp.dot(x, fc1["w"].astype(x.dtype)) + fc1["b"].astype(x.dtype)
    if not (_fused_active() and "w_q" in fc2
            and fc2["w_q"].dtype == jnp.int8 and h.shape[-1] % 128 == 0):
        h = jax.nn.gelu(h, approximate=True)
        if "w_q" in fc2:
            return quantized_linear(fc2, h)
        return jnp.dot(h, fc2["w"].astype(h.dtype)) + fc2["b"].astype(h.dtype)
    *lead, k = h.shape
    h2 = h.reshape(-1, k)
    x_q, x_scale = _quantize_act(h2, act="gelu")
    acc = jax.lax.dot_general(
        x_q, fc2["w_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * x_scale.astype(jnp.float32)
           * fc2["scale"].astype(jnp.float32).reshape(1, -1)).astype(h.dtype)
    out = out + fc2["b"].astype(out.dtype)
    return out.reshape(*lead, out.shape[-1])


def _quantize_leaf_linear(p: Params, qcfg: QuantConfig) -> Params:
    """{"w": [.., K, N], "b"} -> {"w_q", "scale", "b"}; supports a leading
    stacked-layer axis (vmapped quantization per layer)."""
    w = p["w"]
    per_channel = qcfg.granularity == "per_channel"

    if qcfg.dtype == "int8":
        qfn = lambda wi: quantize_weight_int8(wi, per_channel)
    elif qcfg.dtype == "fp8":
        qfn = lambda wi: quantize_weight_fp8(wi, per_channel)
    else:
        raise ValueError(f"unknown quant dtype {qcfg.dtype!r}")

    if w.ndim == 3:  # stacked layers [L, K, N]
        w_q, scale = jax.vmap(qfn)(w)
    else:
        w_q, scale = qfn(w)
    return {"w_q": w_q, "scale": scale, "b": p["b"]}


def quantize_params(params: Params, qcfg: QuantConfig) -> Params:
    """Quantize the causal-DiT parameter pytree per the qconfig. Excluded
    module paths (qcfg.exclude substrings) keep their bf16 weights."""
    if not qcfg.enabled:
        return params

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "w" in tree and "b" in tree and getattr(tree["w"], "ndim", 0) >= 2:
                inside_block = any(s in path for s in _BLOCK_LINEARS)
                excluded = any(s in path for s in qcfg.exclude)
                if inside_block and not excluded:
                    return _quantize_leaf_linear(tree, qcfg)
                return tree
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return tree

    return walk(params)


def magi_distill_quant_to_int8(params: Params) -> Params:
    """Requantize a MAGI fp8 distill-quant checkpoint into W8A8 int8 serving
    weights at load time.

    v5e has no fp8 ALUs, so serving the e4m3 layout as-is dequantizes every
    weight (e4m3 -> f32 convert over all 4.5B parameters) on EVERY forward —
    measured ~5x the matmul bound on the 4.5B window forward (12.0 s vs a
    ~2.4 s compute floor, exp/r2_results.jsonl). Per-channel int8 weights
    feed the MXU's native int8 path instead (the same W8A8 recipe the Wan
    serving path uses), with the reference's activation scaling folded into
    the weights — exact up to the stored quantization's own rounding:

      per-tensor  (act_scale, dit_module.py:434-460):
          out = ((x / a) * a) @ (w_q * ws)            -> W_eff = w_q * ws
      per-channel (smooth_scale + input_scale, :462-490):
          out = (x / smooth) * input_scale @ (w_q * ws)
                              -> W_eff = (input_scale / smooth)[:, None]
                                         * w_q * ws

    Dynamic per-token int8 activation quantization replaces div_clamp_to at
    runtime. Non-quantized leaves (bf16 first/last blocks, embedders, norms)
    pass through unchanged.

    Run this BEFORE placing weights on the accelerator (e.g. under
    `jax.default_device(jax.devices("cpu")[0])`, as the checkpoint loader
    does): the stacked-layer dequant materializes an f32 copy of the
    middle-block weights (~15 GB for 4.5B), fine in host RAM, an OOM on a
    16 GB chip.
    """
    def requant(d):
        ws = d["weight_scale"]
        row = None
        if "smooth_scale" in d:
            row = (d["input_scale"].astype(jnp.float32)
                   / d["smooth_scale"].astype(jnp.float32))

        def one(w_q, ws_i, row_i):
            w = w_q.astype(jnp.float32) * ws_i
            if row_i is not None:
                w = w * row_i[:, None]
            return quantize_weight_int8(w, per_channel=True)

        wq = d["w_q"]
        if wq.ndim == 3:  # stacked middle layers [L, K, N]
            if row is None:
                w_i8, scale = jax.vmap(lambda w, s: one(w, s, None))(wq, ws)
            else:
                w_i8, scale = jax.vmap(one)(wq, ws, row)
        else:
            w_i8, scale = one(wq, ws, row)
        return {"w_q": w_i8, "scale": scale}

    def walk(tree):
        if isinstance(tree, dict):
            if "w_q" in tree and tree["w_q"].dtype == jnp.float8_e4m3fn \
                    and "weight_scale" in tree:
                return requant(tree)
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(params)


_MAGI_BLOCK_LINEARS = ("q", "qx", "k", "v", "kv_xattn", "proj",
                       "fc1", "fc1_up", "fc2")


def magi_quantize_params_int8(params: Params) -> Params:
    """W8A8 int8 serving weights from a plain (bf16/f32) MAGI parameter
    tree — the load path for serving a NON-distill-quant checkpoint (or a
    random init) on the int8 MXU. Same output layout as
    `magi_distill_quant_to_int8` ({w_q int8, scale [out]} per big linear,
    per-out-channel), consumed by `magi_linear`'s int8 branch. Quantizes
    only the transformer-block linears; embedders / adaLN / norms / the
    final head stay high-precision, matching the reference's exclusion set
    (DAX qconfig excludes text_embedding/proj_out/head,
    `example/quantization/run_self_forcing_quantized.py:33-65`)."""
    from .kernels import quantize_weight_int8

    def quant_lin(d):
        w = d["w"]
        if w.ndim == 3:  # stacked layers [L, K, N]
            w_q, scale = jax.vmap(
                lambda wi: quantize_weight_int8(wi, True))(
                w.astype(jnp.float32))
        else:
            w_q, scale = quantize_weight_int8(w.astype(jnp.float32), True)
        out = {"w_q": w_q, "scale": scale}
        if "b" in d:
            out["b"] = d["b"]
        return out

    def walk_block(blk):
        return {k: (quant_lin(v) if k in _MAGI_BLOCK_LINEARS
                    and isinstance(v, dict) and "w" in v else v)
                for k, v in blk.items()}

    out = dict(params)
    for key in ("blocks", "blocks_mid", "blocks_first", "blocks_last"):
        if key in out and isinstance(out[key], dict):
            out[key] = walk_block(out[key])
        elif key in out and isinstance(out[key], list):
            out[key] = [walk_block(b) for b in out[key]]
    return out


def memory_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params))
