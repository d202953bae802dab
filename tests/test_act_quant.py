"""Fused activation-quant Pallas kernel vs the XLA chain (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.ops.act_quant import quantize_rows_int8
from inferix_tpu.quant.kernels import quantize_act_int8_per_token


@pytest.mark.parametrize("m,k", [(64, 256), (100, 1536), (257, 896)])
def test_plain_quant_matches_reference(m, k):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16) * 3.0
    q, s = quantize_rows_int8(x, interpret=True)
    q_ref, s_ref = quantize_act_int8_per_token(x)
    # identical f32 math -> identical outputs
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=0)


def test_gelu_quant_matches_chain():
    x = jax.random.normal(jax.random.PRNGKey(1), (96, 512), jnp.bfloat16) * 2.0
    q, s = quantize_rows_int8(x, act="gelu", interpret=True)
    y = jax.nn.gelu(x, approximate=True)  # engine chain: bf16 gelu
    q_ref, s_ref = quantize_act_int8_per_token(y)
    # kernel computes gelu in f32 then rounds to bf16: allow 1-ulp absmax
    # drift in the scale and +-1 codes
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    dq = np.asarray(q, np.float32) * np.asarray(s)
    dq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
    np.testing.assert_allclose(dq, dq_ref, atol=2 * float(np.max(s_ref)))


def test_zero_rows_padded():
    # rows of zeros (and pad rows) must produce scale floor, codes 0
    x = jnp.zeros((10, 256), jnp.bfloat16)
    q, s = quantize_rows_int8(x, interpret=True)
    assert np.all(np.asarray(q) == 0)
    np.testing.assert_allclose(np.asarray(s), 1e-8)


def test_quantized_linear_prequant_path():
    """quantized_linear with fused act-quant enabled equals the XLA path."""
    from inferix_tpu.core.config import QuantConfig
    from inferix_tpu.quant import api

    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (384, 256), jnp.float32) * 0.02
    b = jnp.zeros((256,), jnp.float32)
    p = api._quantize_leaf_linear(
        {"w": w, "b": b}, QuantConfig(dtype="int8", granularity="per_channel")
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 384), jnp.bfloat16)
    ref = api.quantized_linear(p, x)
    try:
        api.set_fused_act_quant(True, interpret=True)
        out = api.quantized_linear(p, x)
    finally:
        api.set_fused_act_quant(False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-3
    )


def test_ffn_gelu_fused_path_matches():
    """int8 FFN with the fused gelu+quant second matmul equals the chain."""
    from inferix_tpu.core.config import QuantConfig
    from inferix_tpu.quant import api

    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    fc1 = {"w": jax.random.normal(k1, (256, 512), jnp.float32) * 0.02,
           "b": jnp.zeros((512,), jnp.float32)}
    fc2 = {"w": jax.random.normal(k2, (512, 256), jnp.float32) * 0.02,
           "b": jnp.zeros((256,), jnp.float32)}
    qc = QuantConfig(dtype="int8", granularity="per_channel")
    fc1q = api._quantize_leaf_linear(fc1, qc)
    fc2q = api._quantize_leaf_linear(fc2, qc)
    x = jax.random.normal(k3, (48, 256), jnp.bfloat16)

    h = api.quantized_linear(fc1q, x)
    ref = api.quantized_linear(fc2q, jax.nn.gelu(h, approximate=True))
    try:
        api.set_fused_act_quant(True, interpret=True)
        out = api.quantized_ffn(fc1q, fc2q, x)
    finally:
        api.set_fused_act_quant(False)
    # one quant step of headroom: the gelu runs in f32 in-kernel vs bf16 in
    # the XLA chain, so isolated +-1 code flips are expected
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=6e-3, rtol=1e-2,
    )


def test_quantized_ffn_xla_path_is_exact():
    """With the fused path off, quantized_ffn is literally the old chain."""
    from inferix_tpu.core.config import QuantConfig
    from inferix_tpu.quant import api

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    qc = QuantConfig(dtype="int8", granularity="per_channel")
    fc1q = api._quantize_leaf_linear(
        {"w": jax.random.normal(k1, (128, 384), jnp.float32) * 0.02,
         "b": jnp.zeros((384,), jnp.float32)}, qc)
    fc2q = api._quantize_leaf_linear(
        {"w": jax.random.normal(k2, (384, 128), jnp.float32) * 0.02,
         "b": jnp.zeros((128,), jnp.float32)}, qc)
    x = jax.random.normal(k3, (16, 128), jnp.bfloat16)
    ref = api.quantized_linear(
        fc2q, jax.nn.gelu(api.quantized_linear(fc1q, x), approximate=True))
    out = api.quantized_ffn(fc1q, fc2q, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_adaln_quant_kernel_matches_chain():
    """adaln_quantize_rows_int8 == layer_norm + _modulate + per-token quant."""
    from inferix_tpu.ops.act_quant import adaln_quantize_rows_int8
    from inferix_tpu.ops.norms import layer_norm

    b, f, fs, c = 2, 3, 16, 256
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (b, f * fs, c), jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(8), (b, f, c), jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(9), (b, f, c), jnp.float32)

    q, s = adaln_quantize_rows_int8(x, shift, scale, eps=1e-6, interpret=True)
    h = layer_norm(x, eps=1e-6).reshape(b, f, fs, c)
    h = (h * (1.0 + scale[:, :, None, :]) + shift[:, :, None, :]).reshape(
        b * f * fs, c)
    q_ref, s_ref = quantize_act_int8_per_token(h)
    np.testing.assert_array_equal(np.asarray(q).reshape(-1, c),
                                  np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s).reshape(-1, 1),
                               np.asarray(s_ref), rtol=1e-6)


def test_ln_quant_kernel_affine_matches_chain():
    from inferix_tpu.ops.act_quant import ln_quantize_rows_int8
    from inferix_tpu.ops.norms import layer_norm

    m, c = 100, 384
    x = jax.random.normal(jax.random.PRNGKey(10), (m, c), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(11), (c,))
    bb = 0.1 * jax.random.normal(jax.random.PRNGKey(12), (c,))
    q, s = ln_quantize_rows_int8(x, w, bb, eps=1e-6, interpret=True)
    q_ref, s_ref = quantize_act_int8_per_token(layer_norm(x, w, bb, 1e-6))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_block_forward_fused_prologues_match_engine():
    """Full tiny-model forward: fused prologue path vs the unfused chain."""
    import functools

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.kvcache.cache import init_kv_cache
    from inferix_tpu.models.wan.causal_dit import (
        dit_forward_inference, fuse_qkv_params, init_params, make_statics,
        precompute_crossattn_cache)
    from inferix_tpu.ops.rope import build_rope_tables
    from inferix_tpu.quant import api

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    m, r = cfg.model, cfg.runtime
    params = init_params(jax.random.PRNGKey(0), m, dtype=jnp.float32)
    params = api.quantize_params(params, cfg.quant)
    params = fuse_qkv_params(params)
    statics = make_statics(m, 1, m.num_frame_per_block, r.latent_height,
                           r.latent_width, jnp.float32)
    rope = build_rope_tables(m.head_dim, m.rope_max_seq_len)
    xattn = precompute_crossattn_cache(
        params, context=jnp.zeros((1, m.text_len, m.text_dim), jnp.float32),
        cfg=m)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, m.num_frame_per_block, r.latent_height,
                           r.latent_width, r.latent_channels), jnp.float32)
    t = jnp.full((1, m.num_frame_per_block), 400.0, jnp.float32)
    run = functools.partial(dit_forward_inference, params, statics=statics,
                            rope_tables=rope, x=x, t=t, xattn=xattn,
                            current_start=jnp.int32(0), persist_kv=False)
    ref, _ = run(cache=init_kv_cache(statics.spec))
    try:
        api.set_fused_act_quant(True, interpret=True)
        got, _ = run(cache=init_kv_cache(statics.spec))
    finally:
        api.set_fused_act_quant(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("act", ["gelu_exact", "silu_mul"])
def test_magi_act_variants_match_chain(act):
    """The MAGI activation folds (exact gelu, SwiGLU silu*up) equal the
    XLA chain they replace (quant.api.apply_act)."""
    from inferix_tpu.ops.act_quant import quantize_rows_int8
    from inferix_tpu.quant.api import apply_act

    k = 512 if act == "silu_mul" else 384
    x = jax.random.normal(jax.random.PRNGKey(20), (64, k), jnp.bfloat16) * 2.0
    q, s = quantize_rows_int8(x, act=act, interpret=True)
    q_ref, s_ref = quantize_act_int8_per_token(apply_act(x, act))
    assert q.shape == q_ref.shape
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-2)
    dq = np.asarray(q, np.float32) * np.asarray(s)
    dq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)
    np.testing.assert_allclose(dq, dq_ref, atol=2.5 * float(np.max(s_ref)))


def test_magi_int8_walk_fused_act_quant_matches():
    """MAGI walk with int8 W8A8 linears: fused act-quant on vs off."""
    from inferix_tpu.models.magi.dit import (init_magi_params,
                                             tiny_magi_config)
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig
    from inferix_tpu.quant import api

    mcfg = tiny_magi_config()
    params = init_magi_params(jax.random.PRNGKey(0), mcfg, jnp.float32)

    # quantize the mid-block linears to the int8 serving layout
    def int8ify(tree, path=""):
        if isinstance(tree, dict):
            if ("w" in tree and getattr(tree["w"], "ndim", 0) >= 2
                    and "blocks_mid" in path
                    and path.rsplit("/", 1)[-1] in
                    ("q", "qx", "k", "v", "proj", "fc1", "fc2")):
                w = tree["w"]
                absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
                scale = jnp.maximum(absmax / 127.0, 1e-8)
                wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                return {"w_q": wq, "scale": scale.squeeze(-2)}
            return {k: int8ify(v, f"{path}/{k}") for k, v in tree.items()}
        return tree

    qparams = int8ify(params)
    cap = jnp.ones((1, mcfg.caption_max_length, mcfg.caption_channels),
                   jnp.float32) * 0.1
    cmask = jnp.ones((1, mcfg.caption_max_length), jnp.int32)

    def run(fused):
        rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2)
        pipe = MagiPipeline(mcfg, rt, params=qparams, latent_h=8, latent_w=8,
                            max_chunks=6, dtype=jnp.float32)
        try:
            api.set_fused_act_quant(fused, interpret=True)
            return [np.asarray(l) for _, l in
                    pipe.generate_chunks(cap, cmask, chunk_num=2)]
        finally:
            api.set_fused_act_quant(False)

    ref = run(False)
    got = run(True)
    for g, r in zip(got, ref):
        assert np.isfinite(g).all()
        # int8 code flips from the f32-vs-bf16 activation rounding bound the
        # delta at the quant-step scale
        np.testing.assert_allclose(g, r, atol=2e-2, rtol=2e-2)
