"""XLM-RoBERTa text encoder (+ CLIP head) in functional JAX.

Parity target: `inferix/models/wan_base/text_encoder/xlm_roberta.py:49-143`
(XLMRoberta: token/type/position embeddings with mask-cumsum positions,
post-norm attention blocks, final LayerNorm) and the CLIP text head
(`clip.py:303-326` XLMRobertaWithHead: masked mean pooling -> GELU MLP head
to the CLIP embed dim). This is the multilingual text tower of
XLM-Roberta-CLIP; together with `clip_vision.py` it completes the
reference's CLIP encoder pair. Weights load from a torch state dict via
`convert_xlm_roberta_state_dict`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    out_dim: Optional[int] = None   # CLIP head projection (None = encoder only)


def tiny_xlm_roberta_config() -> XLMRobertaConfig:
    return XLMRobertaConfig(vocab_size=128, max_seq_len=32, dim=64,
                            num_heads=4, num_layers=2, out_dim=16)


def _lin(key, i, o, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5)
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((o,), dtype)
    return p


def init_xlm_roberta_params(key, cfg: XLMRobertaConfig,
                            dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "attn": {
                "q": _lin(ks[0], cfg.dim, cfg.dim, dtype),
                "k": _lin(ks[1], cfg.dim, cfg.dim, dtype),
                "v": _lin(ks[2], cfg.dim, cfg.dim, dtype),
                "o": _lin(ks[3], cfg.dim, cfg.dim, dtype),
            },
            "norm1": {"w": jnp.ones((cfg.dim,), dtype),
                      "b": jnp.zeros((cfg.dim,), dtype)},
            "ffn": {
                "fc1": _lin(ks[4], cfg.dim, cfg.dim * 4, dtype),
                "fc2": _lin(ks[5], cfg.dim * 4, cfg.dim, dtype),
            },
            "norm2": {"w": jnp.ones((cfg.dim,), dtype),
                      "b": jnp.zeros((cfg.dim,), dtype)},
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    params = {
        "token_embedding": (jax.random.normal(
            keys[1], (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "type_embedding": (jax.random.normal(
            keys[2], (cfg.type_size, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "pos_embedding": (jax.random.normal(
            keys[3], (cfg.max_seq_len, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "norm": {"w": jnp.ones((cfg.dim,), dtype),
                 "b": jnp.zeros((cfg.dim,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if cfg.out_dim:
        mid = (cfg.dim + cfg.out_dim) // 2
        params["head"] = {
            "fc1": _lin(keys[4], cfg.dim, mid, dtype, bias=False),
            "fc2": _lin(keys[5], mid, cfg.out_dim, dtype, bias=False),
        }
    return params


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    return h * p["w"] + p["b"]


def _linear(p, x):
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def xlm_roberta_encode(params: Params, cfg: XLMRobertaConfig,
                       ids: jax.Array) -> jax.Array:
    """ids: [B, L] int32 -> features [B, L, dim] (pre-pooling)."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    # reference positions: pad_id + cumsum(mask) * mask
    pos = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (params["token_embedding"][ids]
         + params["type_embedding"][jnp.zeros_like(ids)]
         + params["pos_embedding"][pos])
    if cfg.post_norm:
        x = _ln(params["norm"], x, cfg.eps)

    neg = jnp.finfo(jnp.float32).min
    attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]

    def attention(p, h):
        hd = cfg.dim // cfg.num_heads
        q = _linear(p["q"], h).reshape(b, s, cfg.num_heads, hd)
        k = _linear(p["k"], h).reshape(b, s, cfg.num_heads, hd)
        v = _linear(p["v"], h).reshape(b, s, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        probs = jax.nn.softmax(logits + attn_bias, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, cfg.dim)
        return _linear(p["o"], out)

    def layer(h, blk):
        if cfg.post_norm:
            h = _ln(blk["norm1"], h + attention(blk["attn"], h), cfg.eps)
            ff = _linear(blk["ffn"]["fc2"],
                         jax.nn.gelu(_linear(blk["ffn"]["fc1"], h),
                                     approximate=False))
            h = _ln(blk["norm2"], h + ff, cfg.eps)
        else:
            h = h + attention(blk["attn"], _ln(blk["norm1"], h, cfg.eps))
            hn = _ln(blk["norm2"], h, cfg.eps)
            h = h + _linear(blk["ffn"]["fc2"],
                            jax.nn.gelu(_linear(blk["ffn"]["fc1"], hn),
                                        approximate=False))
        return h, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    return x


def xlm_roberta_clip_text(params: Params, cfg: XLMRobertaConfig,
                          ids: jax.Array) -> jax.Array:
    """Full CLIP text feature: encode -> masked mean pool -> MLP head.
    Returns [B, out_dim] (reference XLMRobertaWithHead.forward)."""
    x = xlm_roberta_encode(params, cfg, ids)
    mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
    pooled = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1e-8)
    h = _linear(params["head"]["fc1"], pooled)
    return _linear(params["head"]["fc2"], jax.nn.gelu(h, approximate=False))


def convert_xlm_roberta_state_dict(sd, cfg: XLMRobertaConfig,
                                   dtype=jnp.float32) -> Params:
    """Torch XLMRobertaWithHead state dict -> param pytree."""
    from ...utils.checkpoint import _to_np

    def t2j(name, transpose=False):
        a = _to_np(sd[name])
        return jnp.asarray(a.T if transpose else a).astype(dtype)

    def lin(name, bias=True):
        p = {"w": t2j(f"{name}.weight", transpose=True)}
        if bias:
            p["b"] = t2j(f"{name}.bias")
        return p

    def blk(i):
        pre = f"blocks.{i}"
        return {
            "attn": {
                "q": lin(f"{pre}.attn.q"),
                "k": lin(f"{pre}.attn.k"),
                "v": lin(f"{pre}.attn.v"),
                "o": lin(f"{pre}.attn.o"),
            },
            "norm1": {"w": t2j(f"{pre}.norm1.weight"),
                      "b": t2j(f"{pre}.norm1.bias")},
            "ffn": {"fc1": lin(f"{pre}.ffn.0"), "fc2": lin(f"{pre}.ffn.2")},
            "norm2": {"w": t2j(f"{pre}.norm2.weight"),
                      "b": t2j(f"{pre}.norm2.bias")},
        }

    params = {
        "token_embedding": t2j("token_embedding.weight"),
        "type_embedding": t2j("type_embedding.weight"),
        "pos_embedding": t2j("pos_embedding.weight"),
        "norm": {"w": t2j("norm.weight"), "b": t2j("norm.bias")},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[blk(i) for i in range(cfg.num_layers)]),
    }
    if cfg.out_dim and "head.0.weight" in sd:
        params["head"] = {"fc1": lin("head.0", bias=False),
                         "fc2": lin("head.2", bias=False)}
    return params
