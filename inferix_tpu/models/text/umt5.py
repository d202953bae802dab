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
import functools
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
    # t5-v1_1 (the MAGI text tower, reference `magi/t5/t5_model.py:28`
    # `t5-v1_1-xxl`): ONE relative-position bias table computed in the first
    # layer and shared by all layers. UMT5 keeps a table per layer.
    shared_pos: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


def tiny_umt5_config() -> UMT5Config:
    return UMT5Config(vocab_size=128, dim=64, dim_attn=64, dim_ffn=128,
                      num_heads=4, num_layers=2, num_buckets=8, max_dist=16)


def t5_v1_1_xxl_config() -> UMT5Config:
    """google/t5-v1_1-xxl encoder (the DeepFloyd mirror MAGI downloads,
    reference t5_model.py:96-123): 24 layers, d_model 4096, d_ff 10240,
    64 heads x d_kv 64, vocab 32128, shared relative bias."""
    return UMT5Config(vocab_size=32128, shared_pos=True)


def tiny_t5_v1_1_config() -> UMT5Config:
    return dataclasses.replace(tiny_umt5_config(), shared_pos=True)


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

    def pos_table(k):
        return (jax.random.normal(k, (cfg.num_buckets, cfg.num_heads),
                                  jnp.float32)
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5)

    def block(k):
        ks = jax.random.split(k, 8)
        p = {
            "norm1": {"w": jnp.ones((cfg.dim,), dtype)},
            "attn": {
                "q": _lin(ks[0], cfg.dim, cfg.dim_attn, dtype),
                "k": _lin(ks[1], cfg.dim, cfg.dim_attn, dtype),
                "v": _lin(ks[2], cfg.dim, cfg.dim_attn, dtype),
                "o": _lin(ks[3], cfg.dim_attn, cfg.dim, dtype),
            },
            "norm2": {"w": jnp.ones((cfg.dim,), dtype)},
            "ffn": {
                "gate": _lin(ks[5], cfg.dim, cfg.dim_ffn, dtype),
                "fc1": _lin(ks[6], cfg.dim, cfg.dim_ffn, dtype),
                "fc2": _lin(ks[7], cfg.dim_ffn, cfg.dim, dtype),
            },
        }
        if not cfg.shared_pos:
            # per-layer relative position embedding (UMT5 shared_pos=False)
            p["pos_emb"] = pos_table(ks[4])
        return p

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    params = {
        "token_embedding": jax.random.normal(
            keys[1], (cfg.vocab_size, cfg.dim), jnp.float32
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.ones((cfg.dim,), dtype)},
    }
    if cfg.shared_pos:
        # first-layer table shared by every layer (t5-v1_1)
        params["shared_pos_emb"] = pos_table(keys[2])
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _t5_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (p["w"].astype(jnp.float32) * out).astype(x.dtype)


def _t5_layer_body(x: jax.Array, blk: Params, mask_bias: jax.Array,
                   pos_bias: Optional[jax.Array], buckets: jax.Array,
                   nh: int, hd: int) -> jax.Array:
    """One encoder layer; pos_bias is the shared-layer bias ([1,H,L,L]) or
    None for per-layer relative bias (umt5), in which case blk carries it."""
    b, L = x.shape[:2]
    if pos_bias is None:
        pos_bias = blk["pos_emb"][buckets]             # [L, L, H] f32
        pos_bias = pos_bias.transpose(2, 0, 1)[None]   # [1, H, L, L]
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
    return x


@functools.partial(jax.jit, static_argnames=("nh", "hd"))
def _t5_layer_step(x, blk, mask_bias, pos_bias, buckets, *, nh, hd):
    """Jitted single-layer step for the streamed path — every layer has
    identical shapes, so the loop reuses one compile."""
    return _t5_layer_body(x, blk, mask_bias, pos_bias, buckets, nh, hd)


def umt5_encode(params: Params, cfg: UMT5Config, ids: jax.Array,
                mask: Optional[jax.Array] = None,
                stream_layers: bool = False) -> jax.Array:
    """ids: [B, L] int32; mask: [B, L] (1 = real token). Returns [B, L, dim].

    stream_layers=True runs the layer stack through
    `core.memory.stream_layer_forward` — the DynamicSwapInstaller analog:
    params["blocks"] (and the token embedding) may live in HOST memory
    (numpy) and are streamed to the device one layer at a time with
    double buffering, so a tower larger than free HBM (t5-v1_1-xxl is
    ~11 GB bf16) encodes with only ~2 layer buffers resident."""
    b, L = ids.shape
    emb = params["token_embedding"]
    if stream_layers and not isinstance(emb, jax.Array):
        # host-side gather: only the [B, L, dim] result is transferred
        x = jax.device_put(np.asarray(emb)[np.asarray(ids)])
    else:
        x = emb[ids]
    buckets = jnp.asarray(
        relative_position_buckets(L, cfg.num_buckets, cfg.max_dist)
    )
    if mask is None:
        mask = jnp.ones((b, L), jnp.int32)
    neg = jnp.float32(-1e9)
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]

    nh, hd = cfg.num_heads, cfg.head_dim

    shared_bias = None
    if "shared_pos_emb" in params:
        sp = params["shared_pos_emb"]
        if stream_layers and not isinstance(sp, jax.Array):
            sp = jax.device_put(np.asarray(sp))
        shared_bias = sp[buckets]                          # [L, L, H] f32
        shared_bias = shared_bias.transpose(2, 0, 1)[None]

    if stream_layers:
        from ...core.memory import stream_layer_forward

        x = stream_layer_forward(
            params["blocks"],
            lambda xc, blk: _t5_layer_step(xc, blk, mask_bias, shared_bias,
                                           buckets, nh=nh, hd=hd),
            x,
        )
    else:
        def layer(x, blk):
            return _t5_layer_body(x, blk, mask_bias, shared_bias, buckets,
                                  nh, hd), None

        x, _ = jax.lax.scan(layer, x, params["blocks"])
    norm_w = params["norm"]
    if stream_layers and not isinstance(norm_w["w"], jax.Array):
        norm_w = jax.tree.map(jax.device_put, norm_w)
    return _t5_norm(norm_w, x)


def _setup_encode(params, cfg, stream_layers):
    """Shared tower setup: stream_layers=True converts the big tower keys
    to host numpy and returns an un-jitted per-layer-streaming encode (the
    reference's DynamicSwapInstaller low-VRAM mode — see
    core.memory.stream_layer_forward); otherwise a jitted whole-tower
    encode. Returns (params, encode_fn)."""
    if stream_layers:
        params = dict(params)
        for key in ("blocks", "token_embedding", "shared_pos_emb"):
            if key in params:
                params[key] = jax.tree.map(
                    lambda a: np.asarray(jax.device_get(a)), params[key])
        return params, (lambda p, ids, mask: umt5_encode(
            p, cfg, ids, mask, stream_layers=True))
    return params, jax.jit(
        lambda p, ids, mask: umt5_encode(p, cfg, ids, mask))


class WanTextEncoder:
    """Prompt -> padded text features [B, text_len, dim] (reference
    `WanTextEncoder`, `models/self_forcing/wrapper.py:15-60`: encode with the
    HF tokenizer, zero out padding, pad to text_len)."""

    def __init__(self, cfg: UMT5Config = UMT5Config(),
                 params: Optional[Params] = None,
                 tokenizer=None, text_len: int = 512,
                 dtype=jnp.bfloat16, stream_layers: bool = False):
        """stream_layers=True keeps the tower's blocks + embedding in HOST
        memory and streams one layer at a time to the device (the
        reference's DynamicSwapInstaller low-VRAM mode for the ~11 GB
        umt5-xxl — `core.memory.stream_layer_forward`); params are
        converted to host numpy here if they aren't already."""
        self.cfg = cfg
        self.text_len = text_len
        self.dtype = dtype
        self.params = params if params is not None else init_umt5_params(
            jax.random.key(0), cfg, dtype
        )
        self.tokenizer = tokenizer
        self.stream_layers = stream_layers
        self.params, self._encode = _setup_encode(self.params, cfg,
                                                  stream_layers)

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


# ---------------------------------------------------------------------------
# HF checkpoint conversion (T5EncoderModel — t5-v1_1 and UMT5 layouts)
# ---------------------------------------------------------------------------

def convert_t5_encoder_state_dict(sd, cfg: UMT5Config,
                                  dtype=jnp.bfloat16) -> Params:
    """HF `T5EncoderModel` state dict -> our param pytree.

    Handles both bias layouts: t5-v1_1 keeps one
    `relative_attention_bias` in block 0 (cfg.shared_pos=True), UMT5 one per
    block. Torch Linear weights [out, in] transpose to [in, out]."""
    def t2j(x, dt=dtype):
        a = np.asarray(x.float().numpy() if hasattr(x, "float") else x,
                       np.float32)
        return jnp.asarray(a).astype(dt)

    def lin(name):
        return {"w": t2j(sd[f"{name}.weight"]).T}

    embed_key = ("shared.weight" if "shared.weight" in sd
                 else "encoder.embed_tokens.weight")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        att = f"{pre}.layer.0.SelfAttention"
        p = {
            "norm1": {"w": t2j(sd[f"{pre}.layer.0.layer_norm.weight"])},
            "attn": {n: lin(f"{att}.{n}") for n in ("q", "k", "v", "o")},
            "norm2": {"w": t2j(sd[f"{pre}.layer.1.layer_norm.weight"])},
            "ffn": {
                "gate": lin(f"{pre}.layer.1.DenseReluDense.wi_0"),
                "fc1": lin(f"{pre}.layer.1.DenseReluDense.wi_1"),
                "fc2": lin(f"{pre}.layer.1.DenseReluDense.wo"),
            },
        }
        if not cfg.shared_pos:
            p["pos_emb"] = t2j(
                sd[f"{att}.relative_attention_bias.weight"], jnp.float32)
        blocks.append(p)
    params = {
        "token_embedding": t2j(sd[embed_key]),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": t2j(sd["encoder.final_layer_norm.weight"])},
    }
    if cfg.shared_pos:
        params["shared_pos_emb"] = t2j(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"], jnp.float32)
    return params


# ---------------------------------------------------------------------------
# MAGI caption cleaning (reference magi/t5/t5_model.py:152-278)
# ---------------------------------------------------------------------------

_BAD_PUNCT_RE = None
_URL_RES = None


def _caption_res():
    global _BAD_PUNCT_RE, _URL_RES
    import re

    if _BAD_PUNCT_RE is None:
        _BAD_PUNCT_RE = re.compile(
            r"[" + "#®•©™&@·º½¾¿¡§~" + r"\)" + r"\(" + r"\]" + r"\["
            + r"\}" + r"\{" + r"\|" + "\\\\" + r"\/" + r"\*" + r"]{1,}")
        _URL_RES = [
            re.compile(
                r"\b((?:https?:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.]"
                r"(?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))"),
            re.compile(
                r"\b((?:www:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.]"
                r"(?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))"),
        ]
    return _BAD_PUNCT_RE, _URL_RES


def _basic_clean(text: str) -> str:
    import html

    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass  # mojibake fixing is best-effort; the env may not ship ftfy
    return html.unescape(html.unescape(text)).strip()


def clean_caption(caption: str) -> str:
    """The exact training-stage text cleaning (reference
    `T5Embedder.clean_caption`, magi/t5/t5_model.py:167-278): url/nick/CJK
    stripping, dash and quote normalization, id/filename removal,
    punctuation squeezing."""
    import re
    import urllib.parse as ul

    bad_punct, url_res = _caption_res()
    caption = str(caption)
    caption = ul.unquote_plus(caption)
    caption = caption.strip().lower()
    caption = re.sub("<person>", "person", caption)
    for r in url_res:
        caption = r.sub("", caption)
    try:
        from bs4 import BeautifulSoup

        caption = BeautifulSoup(caption, features="html.parser").text
    except ImportError:
        caption = re.sub(r"<[^>]+>", "", caption)

    caption = re.sub(r"@[\w\d]+\b", "", caption)
    for rng in (r"[\u31c0-\u31ef]+", r"[\u31f0-\u31ff]+",
                r"[\u3200-\u32ff]+", r"[\u3300-\u33ff]+",
                r"[\u3400-\u4dbf]+", r"[\u4dc0-\u4dff]+",
                r"[\u4e00-\u9fff]+"):
        caption = re.sub(rng, "", caption)
    caption = re.sub(
        r"[\u002D\u058A\u05BE\u1400\u1806\u2010-\u2015\u2E17\u2E1A\u2E3A"
        r"\u2E3B\u2E40\u301C\u3030\u30A0\uFE31\uFE32\uFE58\uFE63\uFF0D]+",
        "-", caption)
    caption = re.sub(r"[`´«»“”¨]", '"', caption)
    caption = re.sub(r"[‘’]", "'", caption)
    caption = re.sub(r"&quot;?", "", caption)
    caption = re.sub(r"&amp", "", caption)
    caption = re.sub(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", " ", caption)
    caption = re.sub(r"\d:\d\d\s+$", "", caption)
    caption = re.sub(r"\\n", " ", caption)
    caption = re.sub(r"#\d{1,3}\b", "", caption)
    caption = re.sub(r"#\d{5,}\b", "", caption)
    caption = re.sub(r"\b\d{6,}\b", "", caption)
    caption = re.sub(
        r"[\S]+\.(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)", "", caption)
    caption = re.sub(r"[\"\']{2,}", r'"', caption)
    caption = re.sub(r"[\.]{2,}", r" ", caption)
    caption = bad_punct.sub(r" ", caption)
    caption = re.sub(r"\s+\.\s+", r" ", caption)
    regex2 = re.compile(r"(?:\-|\_)")
    if len(regex2.findall(caption)) > 3:
        caption = regex2.sub(" ", caption)
    caption = _basic_clean(caption)
    caption = re.sub(r"\b[a-zA-Z]{1,3}\d{3,15}\b", "", caption)
    caption = re.sub(r"\b[a-zA-Z]+\d+[a-zA-Z]+\b", "", caption)
    caption = re.sub(r"\b\d+[a-zA-Z]+\d+\b", "", caption)
    caption = re.sub(r"(worldwide\s+)?(free\s+)?shipping", "", caption)
    caption = re.sub(r"(free\s)?download(\sfree)?", "", caption)
    caption = re.sub(r"\bclick\b\s(?:for|on)\s\w+", "", caption)
    caption = re.sub(
        r"\b(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)(\simage[s]?)?", "",
        caption)
    caption = re.sub(r"\bpage\s+\d+\b", "", caption)
    caption = re.sub(
        r"\b\d*[a-zA-Z]+\d+[a-zA-Z]+\d+[a-zA-Z\d]*\b", r" ", caption)
    caption = re.sub(r"\b\d+\.?\d*[xх×]\d+\.?\d*\b", "", caption)
    caption = re.sub(r"\b\s+\:\s+", r": ", caption)
    caption = re.sub(r"(\D[,\./])\b", r"\1 ", caption)
    caption = re.sub(r"\s+", " ", caption)
    caption.strip()
    caption = re.sub(r"^[\"\']([\w\W]+)[\"\']$", r"\1", caption)
    caption = re.sub(r"^[\'\_,\-\:;]", r"", caption)
    caption = re.sub(r"[\'\_,\-\:\-\+]$", r"", caption)
    caption = re.sub(r"^\.\S+$", "", caption)
    return caption.strip()


def text_preprocessing(text: str, use_cleaning: bool = True) -> str:
    """Cleaning applied TWICE like the training stage (t5_model.py:152-159);
    without cleaning, lower+strip."""
    if use_cleaning:
        return clean_caption(clean_caption(text))
    return text.lower().strip()


class MagiT5Embedder:
    """MAGI text tower: cleaned captions -> t5-v1_1-xxl encoder states
    (reference `T5Embedder.get_text_embeddings`, magi/t5/t5_model.py:129-150:
    max_length=120 padding + attention mask, embeddings from the encoder's
    last hidden state)."""

    def __init__(self, cfg: Optional[UMT5Config] = None,
                 params: Optional[Params] = None, tokenizer=None,
                 model_max_length: int = 120, dtype=jnp.bfloat16,
                 use_text_preprocessing: bool = True,
                 stream_layers: bool = False):
        self.cfg = cfg if cfg is not None else t5_v1_1_xxl_config()
        assert self.cfg.shared_pos, "MAGI uses t5-v1_1 (shared_pos=True)"
        self.model_max_length = model_max_length
        self.dtype = dtype
        self.use_text_preprocessing = use_text_preprocessing
        self.params = params if params is not None else init_umt5_params(
            jax.random.key(0), self.cfg, dtype)
        self.tokenizer = tokenizer
        self.params, self._encode = _setup_encode(self.params, self.cfg,
                                                  stream_layers)

    def get_text_embeddings(self, texts):
        """-> (embeddings [B, L, dim], mask [B, L])."""
        texts = [text_preprocessing(t, self.use_text_preprocessing)
                 for t in texts]
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer configured — pass a HF tokenizer "
                "(t5-v1_1-xxl spiece) or precomputed embeddings")
        enc = self.tokenizer(
            texts, max_length=self.model_max_length, padding="max_length",
            truncation=True, return_attention_mask=True,
            add_special_tokens=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(enc["input_ids"]), jnp.int32)
        mask = jnp.asarray(np.asarray(enc["attention_mask"]), jnp.int32)
        embs = self._encode(self.params, ids, mask).astype(self.dtype)
        return embs, mask
