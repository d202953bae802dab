"""Checkpoint loading: torch/safetensors weights -> JAX parameter pytrees.

Replaces the reference's loaders (`inferix/pipeline/self_forcing/pipeline.py:
87-125` torch.load(mmap) of the `generator`/`generator_ema` key;
`inferix/core/checkpoint/inference_loading.py:30-170` threaded sharded
safetensors). Conversion happens on CPU (numpy), then the stacked pytree is
device_put once — no meta-device dance is needed in JAX.

Layout conventions converted here:
  torch Linear weight [out, in]        -> ours [in, out]
  torch Conv3d weight [out,in,kt,kh,kw]-> ours [kt,kh,kw,in,out]
  per-layer block params               -> stacked on a leading L axis
"""
from __future__ import annotations

import concurrent.futures as cf
import os
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig


def _to_np(t) -> np.ndarray:
    """torch tensor -> numpy (via float32 for bf16, cast later)."""
    import torch

    if t.dtype == torch.bfloat16:
        return t.detach().to(torch.float32).cpu().numpy()
    return t.detach().cpu().numpy()


def _lin(sd, prefix, dtype, bias=True):
    w = _to_np(sd[f"{prefix}.weight"]).T.astype(dtype)
    out = {"w": w}
    if bias:
        out["b"] = _to_np(sd[f"{prefix}.bias"]).astype(dtype)
    else:
        out["b"] = np.zeros((w.shape[1],), dtype)
    return out


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pt/.pth file (mmap when possible) and unwrap common nests."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", mmap=True,
                        weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("generator_ema", "generator", "model", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    return sd


def load_sharded_safetensors(directory: str, max_workers: int = 8
                             ) -> Dict[str, np.ndarray]:
    """Threaded load of a sharded-safetensors directory (reference
    inference_loading.py pattern)."""
    from safetensors import safe_open

    files = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.endswith(".safetensors")
    )

    def load_one(path):
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    sd: Dict[str, np.ndarray] = {}
    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        for part in ex.map(load_one, files):
            sd.update(part)
    return sd


def convert_causal_wan_state_dict(
    sd: Dict[str, Any], cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """torch CausalWanModel state dict -> our stacked causal-DiT pytree
    (name map per `inferix/models/self_forcing/causal_model.py:518-658`)."""
    npdtype = np.dtype(jnp.dtype(dtype).name) if dtype != jnp.bfloat16 else np.float32

    def lin(prefix, bias=True):
        return _lin(sd, prefix, npdtype, bias)

    # patch embedding: Conv3d [dim, in, pt, ph, pw] -> [(pt ph pw in), dim]
    pw_ = _to_np(sd["patch_embedding.weight"])
    d_out, c_in, pt, ph, pw2 = pw_.shape
    patch_w = pw_.transpose(2, 3, 4, 1, 0).reshape(pt * ph * pw2 * c_in, d_out)
    params: Dict[str, Any] = {
        "patch_embedding": {
            "w": patch_w.astype(npdtype),
            "b": _to_np(sd["patch_embedding.bias"]).astype(npdtype),
        },
        "text_embedding": {
            "fc1": lin("text_embedding.0"),
            "fc2": lin("text_embedding.2"),
        },
        "time_embedding": {
            "fc1": {k: v.astype(np.float32)
                    for k, v in lin("time_embedding.0").items()},
            "fc2": {k: v.astype(np.float32)
                    for k, v in lin("time_embedding.2").items()},
        },
        "time_projection": {k: v.astype(np.float32)
                            for k, v in lin("time_projection.1").items()},
        "head": {
            "head": lin("head.head"),
            "modulation": _to_np(sd["head.modulation"]).reshape(2, -1)
            .astype(np.float32),
        },
    }

    blocks: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blocks.append({
            "self_attn": {
                "q": lin(f"{p}.self_attn.q"),
                "k": lin(f"{p}.self_attn.k"),
                "v": lin(f"{p}.self_attn.v"),
                "o": lin(f"{p}.self_attn.o"),
                "norm_q": {"w": _to_np(sd[f"{p}.self_attn.norm_q.weight"]).astype(npdtype)},
                "norm_k": {"w": _to_np(sd[f"{p}.self_attn.norm_k.weight"]).astype(npdtype)},
            },
            "cross_attn": {
                "q": lin(f"{p}.cross_attn.q"),
                "k": lin(f"{p}.cross_attn.k"),
                "v": lin(f"{p}.cross_attn.v"),
                "o": lin(f"{p}.cross_attn.o"),
                "norm_q": {"w": _to_np(sd[f"{p}.cross_attn.norm_q.weight"]).astype(npdtype)},
                "norm_k": {"w": _to_np(sd[f"{p}.cross_attn.norm_k.weight"]).astype(npdtype)},
            },
            "norm3": {
                "w": _to_np(sd[f"{p}.norm3.weight"]).astype(npdtype),
                "b": _to_np(sd[f"{p}.norm3.bias"]).astype(npdtype),
            },
            "ffn": {
                "fc1": lin(f"{p}.ffn.0"),
                "fc2": lin(f"{p}.ffn.2"),
            },
            "modulation": _to_np(sd[f"{p}.modulation"]).reshape(6, -1)
            .astype(np.float32),
        })

    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)
    params["blocks"] = stacked
    return jax.tree.map(jnp.asarray, params)


def load_self_forcing_checkpoint(model_path: str, cfg: ModelConfig,
                                 dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a Self-Forcing/CausVid checkpoint directory or .pt file."""
    if os.path.isdir(model_path):
        candidates = [f for f in os.listdir(model_path)
                      if f.endswith((".pt", ".pth", ".bin"))]
        if not candidates:
            raise FileNotFoundError(f"no checkpoint in {model_path}")
        path = os.path.join(model_path, sorted(candidates)[0])
    else:
        path = model_path
    sd = load_torch_state_dict(path)
    params = convert_causal_wan_state_dict(sd, cfg, dtype)
    # cast big weights to target dtype, keep fp32 modulation/time params
    def cast(path_parts, x):
        name = "/".join(str(p) for p in path_parts)
        if "time_" in name or "modulation" in name:
            return x.astype(jnp.float32)
        return x.astype(dtype) if x.ndim >= 2 else x
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: cast([getattr(k, "key", k) for k in kp], x), params
    )


# ---------------------------------------------------------------------------
# VAE weights
# ---------------------------------------------------------------------------

def convert_wan_vae_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch WanVAE_ state dict -> our functional VAE pytree. The reference
    module tree (vae.py:477-512: encoder/decoder/conv1/conv2) maps onto our
    init_encoder/init_decoder layout; conv weights are transposed to
    [kt,kh,kw,in,out] and 2D convs gain a leading kt=1 axis."""

    def conv3d(prefix):
        w = _to_np(sd[f"{prefix}.weight"])
        if w.ndim == 4:  # Conv2d [out,in,kh,kw] -> [1,kh,kw,in,out]
            w = w.transpose(2, 3, 1, 0)[None]
        else:            # Conv3d [out,in,kt,kh,kw]
            w = w.transpose(2, 3, 4, 1, 0)
        return {"w": w, "b": _to_np(sd[f"{prefix}.bias"])}

    def gamma(prefix):
        g = _to_np(sd[f"{prefix}.gamma"])
        return {"gamma": g.reshape(-1)}

    def res(prefix, cin, cout):
        p = {
            "norm1": gamma(f"{prefix}.residual.0"),
            "conv1": conv3d(f"{prefix}.residual.2"),
            "norm2": gamma(f"{prefix}.residual.3"),
            "conv2": conv3d(f"{prefix}.residual.6"),
        }
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = conv3d(f"{prefix}.shortcut")
        return p

    def attn(prefix):
        qkv = conv3d(f"{prefix}.to_qkv")
        proj = conv3d(f"{prefix}.proj")
        return {"norm": gamma(f"{prefix}.norm"), "qkv": qkv, "proj": proj}

    # walk the torch module indices in the same order our init builds layers
    from ..models.wan.vae import VAEConfig

    cfg = VAEConfig()
    out: Dict[str, Any] = {
        "conv1": conv3d("conv1"),
        "conv2": conv3d("conv2"),
    }

    # encoder
    enc: Dict[str, Any] = {"conv1": conv3d("encoder.conv1")}
    downs = []
    idx = 0
    dims = [cfg.dim * u for u in (1, *cfg.dim_mult)]
    scale = 1.0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            downs.append({"res": res(f"encoder.downsamples.{idx}", cin, cout)})
            idx += 1
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            rp = {"conv": conv3d(f"encoder.downsamples.{idx}.resample.1")}
            if mode == "downsample3d":
                rp["time_conv"] = conv3d(f"encoder.downsamples.{idx}.time_conv")
            downs.append({f"resample:{mode}": rp})
            idx += 1
    enc["downsamples"] = downs
    enc["middle"] = {
        "res1": res("encoder.middle.0", dims[-1], dims[-1]),
        "attn": attn("encoder.middle.1"),
        "res2": res("encoder.middle.2", dims[-1], dims[-1]),
    }
    enc["head_norm"] = gamma("encoder.head.0")
    enc["head_conv"] = conv3d("encoder.head.2")
    out["encoder"] = enc

    # decoder
    dec: Dict[str, Any] = {"conv1": conv3d("decoder.conv1")}
    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1], *reversed(cfg.dim_mult))]
    dec["middle"] = {
        "res1": res("decoder.middle.0", ddims[0], ddims[0]),
        "attn": attn("decoder.middle.1"),
        "res2": res("decoder.middle.2", ddims[0], ddims[0]),
    }
    ups = []
    idx = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2
        for _ in range(cfg.num_res_blocks + 1):
            ups.append({"res": res(f"decoder.upsamples.{idx}", cin, cout)})
            idx += 1
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            rp = {"conv": conv3d(f"decoder.upsamples.{idx}.resample.1")}
            if mode == "upsample3d":
                rp["time_conv"] = conv3d(f"decoder.upsamples.{idx}.time_conv")
            ups.append({f"resample:{mode}": rp})
            idx += 1
    dec["upsamples"] = ups
    dec["head_norm"] = gamma("decoder.head.0")
    dec["head_conv"] = conv3d("decoder.head.2")
    out["decoder"] = dec

    return jax.tree.map(jnp.asarray, out)


def load_wan_vae(vae_path: str):
    """Wan2.1_VAE.pth -> CausalVAE with real weights."""
    from ..models.wan.vae import CausalVAE, VAEConfig

    sd = load_torch_state_dict(vae_path)
    params = convert_wan_vae_state_dict(sd)
    return CausalVAE(VAEConfig(), params=params)
