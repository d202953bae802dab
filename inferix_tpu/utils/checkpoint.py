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
    """torch tensor or numpy array -> numpy (via float32 for bf16/fp8)."""
    if isinstance(t, np.ndarray):
        return t
    import torch

    if t.dtype == torch.bfloat16 or "float8" in str(t.dtype):
        # numpy has no bf16/fp8: round-trip through f32 (exact — f32 is a
        # superset; the caller re-casts to the target jnp dtype)
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

    if dtype == jnp.bfloat16:
        # cast big weights to bf16 ON HOST before the device transfer —
        # transferring f32 and casting on device would double both the
        # transfer bytes and the transient HBM (f32 model resident until
        # the cast completes). Policy matches load_self_forcing_checkpoint:
        # ndim>=2 weights to bf16; 1-d params and the fp32-by-contract
        # modulation / time embedders stay f32.
        import ml_dtypes

        def host_cast(path_parts, x):
            name = "/".join(str(getattr(p, "key", p)) for p in path_parts)
            if "time_" in name or "modulation" in name or x.ndim < 2:
                return x
            return x.astype(ml_dtypes.bfloat16)

        params = jax.tree_util.tree_map_with_path(host_cast, params)
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

def convert_wan_vae_state_dict(sd: Dict[str, Any], cfg=None) -> Dict[str, Any]:
    """torch WanVAE_ state dict -> our functional VAE pytree. The reference
    module tree (vae.py:477-512: encoder/decoder/conv1/conv2) maps onto our
    init_encoder/init_decoder layout; conv weights are transposed to
    [kt,kh,kw,in,out] and 2D convs gain a leading kt=1 axis.

    `cfg` is the VAEConfig describing the checkpoint's geometry (defaults to
    the production Wan 2.1 VAE)."""

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

    if cfg is None:
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


def load_wan_vae(vae_path: str, cfg=None):
    """Wan2.1_VAE.pth -> CausalVAE with real weights."""
    from ..models.wan.vae import CausalVAE, VAEConfig

    if cfg is None:
        cfg = VAEConfig()
    sd = load_torch_state_dict(vae_path)
    params = convert_wan_vae_state_dict(sd, cfg)
    return CausalVAE(cfg, params=params)


# ---------------------------------------------------------------------------
# MAGI-1 checkpoint conversion (incl. distill-quant fp8 + learned rope)
# ---------------------------------------------------------------------------

def convert_magi_state_dict(sd: Dict[str, Any], cfg,
                            dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Reference MAGI `VideoDiTModel` state dict -> our param pytree.

    Handles both bf16 and the shipped "distill_quant" fp8 checkpoints
    (`inferix/models/magi/dit/dit_module.py:367-490`): middle layers carry
    e4m3 weights [1, out, in] + weight_scale/input_scale(/smooth_scale);
    first/last layers stay bf16. The learned rotary bands (`rope.bands`,
    dit_module.py:723-775) are baked into `rope_bands`. Tensor layouts:
    torch Linear weights [out, in] transpose to [in, out]; the conv3d
    x_embedder reshapes to our (ph, pw, C)-ordered patch matmul.
    """
    L = cfg.num_layers

    def t2j(x, dt=None):
        a = _to_np(x)
        out = jnp.asarray(a)
        return out.astype(dt) if dt is not None else out

    def lin_t(name, dt=dtype, bias=False):
        p = {"w": t2j(sd[f"{name}.weight"]).T.astype(dt)}
        if bias:
            p["b"] = t2j(sd[f"{name}.bias"], dt)
        return p

    def maybe_quant_lin(name, dt=dtype):
        """Plain or fp8 linear depending on the checkpoint's tensors."""
        if f"{name}.weight_scale" in sd:
            w_q = _to_np(sd[f"{name}.weight"])           # [1, out, in] e4m3
            w_q = jnp.asarray(w_q.reshape(w_q.shape[-2], w_q.shape[-1])).T
            p = {
                "w_q": w_q.astype(jnp.float8_e4m3fn),
                "weight_scale": t2j(sd[f"{name}.weight_scale"],
                                    jnp.float32).reshape(()),
            }
            if f"{name}.smooth_scale" in sd:             # per-channel
                p["smooth_scale"] = t2j(sd[f"{name}.smooth_scale"],
                                        jnp.float32).reshape(-1)
                p["input_scale"] = t2j(sd[f"{name}.input_scale"],
                                       jnp.float32).reshape(())
            else:                                        # per-tensor
                p["act_scale"] = t2j(sd[f"{name}.input_scale"],
                                     jnp.float32).reshape(-1)
            return p
        return lin_t(name, dt)

    def ln_t(name, dt=jnp.float32):
        return {"w": t2j(sd[f"{name}.weight"], dt),
                "b": t2j(sd[f"{name}.bias"], dt)}

    def block(i):
        pre = f"videodit_blocks.layers.{i}"
        att = f"{pre}.self_attention"
        return {
            "ln_qkv": ln_t(f"{att}.linear_qkv.layer_norm", dtype),
            "q": maybe_quant_lin(f"{att}.linear_qkv.q"),
            "qx": maybe_quant_lin(f"{att}.linear_qkv.qx"),
            "k": maybe_quant_lin(f"{att}.linear_qkv.k"),
            "v": maybe_quant_lin(f"{att}.linear_qkv.v"),
            "q_ln": ln_t(f"{att}.q_layernorm"),
            "qx_ln": ln_t(f"{att}.q_layernorm_xattn"),
            "k_ln": ln_t(f"{att}.k_layernorm"),
            "kx_ln": ln_t(f"{att}.k_layernorm_xattn"),
            "kv_xattn": lin_t(f"{att}.linear_kv_xattn"),
            "proj": maybe_quant_lin(f"{att}.linear_proj"),
            "ada_proj": lin_t(f"{pre}.ada_modulate_layer.proj.0",
                              jnp.float32, bias=True),
            "self_post_norm": ln_t(f"{pre}.self_attn_post_norm"),
            "mlp_post_norm": ln_t(f"{pre}.mlp_post_norm"),
            "mlp_ln": ln_t(f"{pre}.mlp.layer_norm", dtype),
            "fc1": maybe_quant_lin(f"{pre}.mlp.linear_fc1"),
            "fc2": maybe_quant_lin(f"{pre}.mlp.linear_fc2"),
        }

    blocks = [block(i) for i in range(L)]
    quantized = any("w_q" in b["q"] for b in blocks)

    # x_embedder: Conv3d [h, C, tp, ph, pw] -> matmul [(ph pw C), h] matching
    # our patchify feature order (ph, pw, c)
    w = _to_np(sd["x_embedder.weight"])
    h_dim = w.shape[0]
    w = w.reshape(h_dim, cfg.in_channels, cfg.t_patch_size, cfg.patch_size,
                  cfg.patch_size)
    w = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, h_dim)  # tp,ph,pw,C major

    params = {
        "x_embedder": {"w": jnp.asarray(w).astype(dtype)},
        "t_embedder": {
            "fc1": lin_t("t_embedder.mlp.0", jnp.float32, bias=True),
            "fc2": lin_t("t_embedder.mlp.2", jnp.float32, bias=True),
        },
        "y_embedder": {
            "y_proj_xattn": lin_t("y_embedder.y_proj_xattn.0", dtype,
                                  bias=True),
            "y_proj_adaln": lin_t("y_embedder.y_proj_adaln.0", jnp.float32,
                                  bias=True),
            "null_caption_embedding": t2j(
                sd["y_embedder.null_caption_embedding"], dtype),
        },
        "rope_bands": t2j(sd["rope.bands"], jnp.float32),
        "final_layernorm": ln_t("videodit_blocks.final_layernorm"),
        "final_linear": lin_t("final_linear.linear"),
    }

    stack = lambda bs: jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
    if quantized:
        params["blocks_first"] = blocks[0]
        params["blocks_mid"] = stack(blocks[1:-1])
        params["blocks_last"] = blocks[-1]
    else:
        params["blocks"] = stack(blocks)
    return params


# ---------------------------------------------------------------------------
# MAGI ViT-VAE checkpoint conversion (learnable pos embeds + rotary)
# ---------------------------------------------------------------------------

def vitvae_config_from_ddconfig(dd: Dict[str, Any], **overrides):
    """Reference checkpoint `config.json` ddconfig -> ViTVAEConfig
    (`inferix/models/magi/vae/vae_model.py:224-246` ViTVAE ddconfig keys)."""
    from ..models.magi.vae import ViTVAEConfig

    keymap = dict(
        video_size="video_size", video_length="video_length",
        patch_size="patch_size", patch_length="patch_length",
        in_chans="in_chans", z_chans="z_chans", double_z="double_z",
        embed_dim="embed_dim", depth="depth", num_heads="num_heads",
        mlp_ratio="mlp_ratio", qkv_bias="qkv_bias",
        with_cls_token="with_cls_token", ln_in_attn="ln_in_attn",
        use_rope="use_rope", use_final_proj="use_final_proj",
        norm_code="norm_code",
    )
    kwargs = {ours: dd[theirs] for theirs, ours in keymap.items()
              if theirs in dd}
    kwargs.update(overrides)
    return ViTVAEConfig(**kwargs)


def convert_magi_vae_state_dict(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Reference MAGI `ViTVAE` state dict -> our param pytree.

    Faithful to `inferix/models/magi/vae/vae_module.py`: learnable
    `pos_embed` [1, N+cls, D] and `cls_token` load verbatim (rotary tables
    are analytic — `freq_bands` has no parameters); Conv3d patch embedding
    [D, C, pl, ps, ps] reshapes to our (C, pl, ph, pw)-ordered patch matmul;
    the decoder's 3x3x3 `last_layer` Conv3d [O, I, kd, kh, kw] transposes to
    channels-last DHWIO."""
    def t2j(x, dt=jnp.float32):
        return jnp.asarray(_to_np(x)).astype(dt)

    def lin_t(name, bias=True):
        p = {"w": t2j(sd[f"{name}.weight"]).T}
        if bias and f"{name}.bias" in sd:
            p["b"] = t2j(sd[f"{name}.bias"])
        return p

    def ln_t(name):
        return {"w": t2j(sd[f"{name}.weight"]), "b": t2j(sd[f"{name}.bias"])}

    def block_t(prefix):
        p = {
            "qkv": lin_t(f"{prefix}.attn.qkv"),
            "proj": lin_t(f"{prefix}.attn.proj"),
            "norm2": ln_t(f"{prefix}.norm2"),
            "fc1": lin_t(f"{prefix}.mlp.fc1"),
            "fc2": lin_t(f"{prefix}.mlp.fc2"),
        }
        if not cfg.ln_in_attn:
            p["norm1"] = ln_t(f"{prefix}.norm1")
        return p

    def tower(side, first, last):
        blocks = [block_t(f"{side}.blocks.{i}") for i in range(cfg.depth)]
        t = {
            **first,
            "pos_embed": t2j(sd[f"{side}.pos_embed"])[0],
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "norm": ln_t(f"{side}.norm"),
            **last,
        }
        if cfg.with_cls_token:
            t["cls_token"] = t2j(sd[f"{side}.cls_token"]).reshape(-1)
        return t

    d = cfg.embed_dim
    pw = _to_np(sd["encoder.patch_embed.proj.weight"])   # [D, C, pl, ps, ps]
    enc_patch = {"w": jnp.asarray(pw.reshape(d, -1).T, jnp.float32),
                 "b": t2j(sd["encoder.patch_embed.proj.bias"])}
    enc = tower("encoder", {"patch": enc_patch},
                {"last": lin_t("encoder.last_layer")})

    cw = _to_np(sd["decoder.last_layer.weight"])         # [O, I, kd, kh, kw]
    dec_last = {"last_conv": {
        "w": jnp.asarray(cw.transpose(2, 3, 4, 1, 0), jnp.float32),
        "b": t2j(sd["decoder.last_layer.bias"])}}
    if cfg.use_final_proj:
        dec_last["final_proj"] = lin_t("decoder.final_proj")
        dec_last["final_norm"] = ln_t("decoder.final_norm")
    dec = tower("decoder", {"proj_in": lin_t("decoder.proj_in")}, dec_last)
    return {"encoder": enc, "decoder": dec}


def load_magi_vae(path: str, **config_overrides):
    """MAGI VAE checkpoint directory (diffusers layout: config.json +
    weights) -> ViTVAE with real weights."""
    import json
    import os

    from ..models.magi.vae import ViTVAE

    with open(os.path.join(path, "config.json")) as f:
        conf = json.load(f)
    dd = conf.get("ddconfig", conf)
    cfg = vitvae_config_from_ddconfig(dd, **config_overrides)
    sd = None
    for name in ("diffusion_pytorch_model.safetensors",
                 "model.safetensors"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            from safetensors import safe_open

            sd = {}
            with safe_open(p, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
            break
    if sd is None:
        for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                sd = load_torch_state_dict(p)
                break
    if sd is None:
        raise FileNotFoundError(f"no weights found under {path}")
    return ViTVAE(cfg, params=convert_magi_vae_state_dict(sd, cfg))
