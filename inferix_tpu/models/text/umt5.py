"""UMT5 text encoder in functional JAX.

Parity with the reference encoder (`inferix/models/wan_base/text_encoder/
t5.py:55-375`, `umt5_xxl` config :458-470): pre-norm T5 blocks with UNSCALED
attention + relative position bias (per-layer, `shared_pos=False` for UMT5),
gated-GELU feed-forward, T5LayerNorm (no mean subtraction), final norm.
TPU-first: layers stacked on a leading axis and scanned; the relative-position
bucket table is precomputed host-side per sequence length.

UMT5-XXL: vocab 256384, dim 4096, ffn 10240, 64 heads, 24 layers, 32 buckets.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


def tiny_umt5_config() -> UMT5Config:
    return UMT5Config(vocab_size=128, dim=64, dim_attn=64, dim_ffn=128,
                      num_heads=4, num_layers=2, num_buckets=8, max_dist=16)


# ---------------------------------------------------------------------------
# Relative position buckets (host-side, bidirectional)
# ---------------------------------------------------------------------------

def relative_position_buckets(seq_len: int, num_buckets: int,
                              max_dist: int = 128) -> np.ndarray:
    """[L, L] int32 bucket ids (reference `_relative_position_bucket`,
    t5.py:247-266, bidirectional)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    rel_pos = mem - ctx
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        rel_pos_large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    rel_pos_large = np.minimum(rel_pos_large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, rel_pos_large)
    return rel_buckets.astype(np.int32)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _lin(key, i, o, dtype):
    return {"w": (jax.random.normal(key, (i, o), jnp.float32)
                  * (i**-0.5)).astype(dtype)}


def init_umt5_params(key, cfg: UMT5Config, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, 4)

    def block(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), dtype)},
            "attn": {
                "q": _lin(ks[0], cfg.dim, cfg.dim_attn, dtype),
                "k": _lin(ks[1], cfg.dim, cfg.dim_attn, dtype),
                "v": _lin(ks[2], cfg.dim, cfg.dim_attn, dtype),
                "o": _lin(ks[3], cfg.dim_attn, cfg.dim, dtype),
            },
            # per-layer relative position embedding (UMT5 shared_pos=False)
            "pos_emb": (jax.random.normal(ks[4], (cfg.num_buckets, cfg.num_heads),
                                          jnp.float32)
                        * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
            "norm2": {"w": jnp.ones((cfg.dim,), dtype)},
            "ffn": {
                "gate": _lin(ks[5], cfg.dim, cfg.dim_ffn, dtype),
                "fc1": _lin(ks[6], cfg.dim, cfg.dim_ffn, dtype),
                "fc2": _lin(ks[7], cfg.dim_ffn, cfg.dim, dtype),
            },
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "token_embedding": jax.random.normal(
            keys[1], (cfg.vocab_size, cfg.dim), jnp.float32
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.ones((cfg.dim,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _t5_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (p["w"].astype(jnp.float32) * out).astype(x.dtype)


def umt5_encode(params: Params, cfg: UMT5Config, ids: jax.Array,
                mask: Optional[jax.Array] = None) -> jax.Array:
    """ids: [B, L] int32; mask: [B, L] (1 = real token). Returns [B, L, dim]."""
    b, L = ids.shape
    x = params["token_embedding"][ids]
    buckets = jnp.asarray(
        relative_position_buckets(L, cfg.num_buckets, cfg.max_dist)
    )
    if mask is None:
        mask = jnp.ones((b, L), jnp.int32)
    neg = jnp.float32(-1e9)
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]

    nh, hd = cfg.num_heads, cfg.head_dim

    def layer(x, blk):
        pos_bias = blk["pos_emb"][buckets]                 # [L, L, H] f32
        pos_bias = pos_bias.transpose(2, 0, 1)[None]       # [1, H, L, L]
        h = _t5_norm(blk["norm1"], x)
        q = jnp.dot(h, blk["attn"]["q"]["w"].astype(h.dtype)).reshape(b, L, nh, hd)
        k = jnp.dot(h, blk["attn"]["k"]["w"].astype(h.dtype)).reshape(b, L, nh, hd)
        v = jnp.dot(h, blk["attn"]["v"]["w"].astype(h.dtype)).reshape(b, L, nh, hd)
        # T5 attention is unscaled
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, L, nh * hd)
        x = x + jnp.dot(o, blk["attn"]["o"]["w"].astype(o.dtype))

        h = _t5_norm(blk["norm2"], x)
        gate = jax.nn.gelu(
            jnp.dot(h, blk["ffn"]["gate"]["w"].astype(h.dtype)),
            approximate=True,
        )
        ff = jnp.dot(h, blk["ffn"]["fc1"]["w"].astype(h.dtype)) * gate
        x = x + jnp.dot(ff, blk["ffn"]["fc2"]["w"].astype(ff.dtype))
        return x, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    return _t5_norm(params["norm"], x)


class WanTextEncoder:
    """Prompt -> padded text features [B, text_len, dim] (reference
    `WanTextEncoder`, `models/self_forcing/wrapper.py:15-60`: encode with the
    HF tokenizer, zero out padding, pad to text_len)."""

    def __init__(self, cfg: UMT5Config = UMT5Config(),
                 params: Optional[Params] = None,
                 tokenizer=None, text_len: int = 512,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.text_len = text_len
        self.dtype = dtype
        self.params = params if params is not None else init_umt5_params(
            jax.random.key(0), cfg, dtype
        )
        self.tokenizer = tokenizer
        self._encode = jax.jit(
            lambda p, ids, mask: umt5_encode(p, cfg, ids, mask)
        )

    def _tokenize(self, prompts):
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer configured — pass precomputed embeddings or a "
                "HF tokenizer (google/umt5-xxl)"
            )
        enc = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=self.text_len, return_tensors="np",
        )
        return np.asarray(enc["input_ids"]), np.asarray(enc["attention_mask"])

    def __call__(self, prompts) -> jax.Array:
        ids, mask = self._tokenize(list(prompts))
        feats = self._encode(self.params, jnp.asarray(ids, jnp.int32),
                             jnp.asarray(mask, jnp.int32))
        # zero padded positions (reference cuts at seq_lens then zero-pads)
        return (feats * jnp.asarray(mask)[..., None]).astype(self.dtype)
