"""CLIP vision tower for image-to-video conditioning.

Parity target: the reference's CLIP visual encoder
(`inferix/models/wan_base/text_encoder/clip.py:542` XLM-RoBERTa-CLIP; its
vision side produces the 257 image tokens consumed by `WanI2VCrossAttention`
via `MLPProj`, `wan_base/model.py:105-147`). This is a standard ViT-L/14-ish
vision transformer in functional JAX: conv patch embed (as reshape+matmul),
CLS token, learned positional embeddings, pre-norm blocks, final layer norm.
Output: [B, 1 + (H/ps)*(W/ps), width] token features (257 tokens at 224/14)
fed to `precompute_crossattn_cache(..., clip_features=...)`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280        # ViT-H/14 width -> matches img_emb's 1280 input
    layers: int = 32
    heads: int = 16
    mlp_ratio: float = 4.0

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return 1 + self.grid * self.grid  # 257 at 224/14


def tiny_clip_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4)


def _lin(key, i, o, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    return {
        "w": (jax.random.normal(k1, (i, o), jnp.float32) * (i**-0.5)).astype(dtype),
        "b": jnp.zeros((o,), dtype),
    }


def init_clip_vision_params(key, cfg: CLIPVisionConfig,
                            dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    w = cfg.width
    patch_in = cfg.patch_size**2 * 3

    def block(k):
        bs = jax.random.split(k, 4)
        return {
            "ln1": {"w": jnp.ones((w,)), "b": jnp.zeros((w,))},
            "qkv": _lin(bs[0], w, 3 * w, dtype),
            "proj": _lin(bs[1], w, w, dtype),
            "ln2": {"w": jnp.ones((w,)), "b": jnp.zeros((w,))},
            "fc1": _lin(bs[2], w, int(w * cfg.mlp_ratio), dtype),
            "fc2": _lin(bs[3], int(w * cfg.mlp_ratio), w, dtype),
        }

    blocks = [block(k) for k in jax.random.split(ks[0], cfg.layers)]
    return {
        "patch": _lin(ks[1], patch_in, w, dtype),
        "cls": jax.random.normal(ks[2], (1, 1, w), jnp.float32).astype(dtype) * 0.02,
        "pos": jax.random.normal(ks[3], (1, cfg.num_tokens, w),
                                 jnp.float32).astype(dtype) * 0.02,
        "ln_pre": {"w": jnp.ones((w,)), "b": jnp.zeros((w,))},
        "blocks": jax.tree.map(lambda *x: jnp.stack(x), *blocks),
        "ln_post": {"w": jnp.ones((w,)), "b": jnp.zeros((w,))},
    }


def clip_vision_encode(params: Params, cfg: CLIPVisionConfig,
                       image: jax.Array) -> jax.Array:
    """image: [B, H, W, 3] in [-1, 1] -> tokens [B, 1+grid^2, width]."""
    from ...ops.norms import layer_norm

    b, hh, ww, c = image.shape
    ps = cfg.patch_size
    x = image.reshape(b, hh // ps, ps, ww // ps, ps, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hh // ps) * (ww // ps),
                                              ps * ps * c)
    x = jnp.dot(x, params["patch"]["w"].astype(x.dtype)) \
        + params["patch"]["b"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"].astype(x.dtype)
    x = layer_norm(x, params["ln_pre"]["w"], params["ln_pre"]["b"])

    nh = cfg.heads
    hd = cfg.width // nh

    def blk(h, p):
        y = layer_norm(h, p["ln1"]["w"], p["ln1"]["b"])
        qkv = (jnp.dot(y, p["qkv"]["w"].astype(y.dtype))
               + p["qkv"]["b"].astype(y.dtype))
        qkv = qkv.reshape(b, -1, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, -1, cfg.width)
        h = h + jnp.dot(o, p["proj"]["w"].astype(o.dtype)) \
            + p["proj"]["b"].astype(o.dtype)
        y = layer_norm(h, p["ln2"]["w"], p["ln2"]["b"])
        ff = jnp.dot(jax.nn.gelu(
            jnp.dot(y, p["fc1"]["w"].astype(y.dtype))
            + p["fc1"]["b"].astype(y.dtype)), p["fc2"]["w"].astype(y.dtype)) \
            + p["fc2"]["b"].astype(y.dtype)
        return h + ff, None

    x, _ = jax.lax.scan(blk, x, params["blocks"])
    return layer_norm(x, params["ln_post"]["w"], params["ln_post"]["b"])


class CLIPImageEncoder:
    """Image -> 257-token CLIP features for the i2v cross-attention branch."""

    def __init__(self, cfg: CLIPVisionConfig = CLIPVisionConfig(),
                 params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.params = params if params is not None else init_clip_vision_params(
            key if key is not None else jax.random.key(0), cfg
        )
        self._encode = jax.jit(
            lambda p, img: clip_vision_encode(p, cfg, img)
        )

    def __call__(self, image: jax.Array) -> jax.Array:
        if image.ndim == 3:
            image = image[None]
        return self._encode(self.params, image)
