"""Quantization: kernel parity (interpret mode), recipe behavior, and the
quantized end-to-end semi-AR loop staying close to bf16."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import QuantConfig, tiny_test_config
from inferix_tpu.quant.api import memory_bytes, quantize_params, quantized_linear
from inferix_tpu.quant.kernels import (
    fp8_matmul,
    fp8_matmul_xla,
    int8_matmul,
    int8_matmul_xla,
    quantize_act_int8_per_token,
    quantize_weight_fp8,
    quantize_weight_int8,
)


def _data(m=64, k=256, n=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    return x, w


def test_int8_quant_dequant_roundtrip():
    _, w = _data()
    w_q, scale = quantize_weight_int8(w, per_channel=True)
    w_back = w_q.astype(jnp.float32) * scale[None, :]
    err = np.abs(np.asarray(w_back - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # <=1 LSB of 127


def test_int8_matmul_kernel_parity():
    x, w = _data()
    w_q, w_scale = quantize_weight_int8(w, per_channel=True)
    x_q, x_scale = quantize_act_int8_per_token(x)
    want = int8_matmul_xla(x_q, w_q, x_scale, w_scale, out_dtype=jnp.float32)
    got = int8_matmul(x_q, w_q, x_scale, w_scale, out_dtype=jnp.float32,
                      bm=32, bn=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_int8_matmul_vs_fp32():
    """Quantized result tracks the fp32 matmul within int8 error bounds."""
    x, w = _data()
    w_q, w_scale = quantize_weight_int8(w, per_channel=True)
    x_q, x_scale = quantize_act_int8_per_token(x)
    got = int8_matmul(x_q, w_q, x_scale, w_scale, out_dtype=jnp.float32,
                      bm=32, bn=128, bk=128, interpret=True)
    want = x @ w
    rel = np.abs(np.asarray(got - want)).max() / np.abs(np.asarray(want)).max()
    assert rel < 0.02, rel


def test_fp8_matmul_parity():
    x, w = _data(seed=1)
    w_q, w_scale = quantize_weight_fp8(w, per_channel=True)
    want = fp8_matmul_xla(x, w_q, w_scale, out_dtype=jnp.float32)
    got = fp8_matmul(x, w_q, w_scale, out_dtype=jnp.float32,
                     bm=32, bn=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # and tracks fp32 closely
    full = x @ w
    rel = np.abs(np.asarray(got) - np.asarray(full)).max() \
        / np.abs(np.asarray(full)).max()
    assert rel < 0.05, rel


def test_unaligned_shapes():
    x, w = _data(m=13, k=200, n=60)
    w_q, w_scale = quantize_weight_int8(w)
    x_q, x_scale = quantize_act_int8_per_token(x)
    got = int8_matmul(x_q, w_q, x_scale, w_scale, out_dtype=jnp.float32,
                      bm=32, bn=128, bk=128, interpret=True)
    want = int8_matmul_xla(x_q, w_q, x_scale, w_scale, out_dtype=jnp.float32)
    assert got.shape == (13, 60)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quantize_params_structure_and_memory():
    from inferix_tpu.models.wan.causal_dit import init_params

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)
    before = memory_bytes(params["blocks"])
    qcfg = QuantConfig(enabled=True, dtype="int8", granularity="per_channel")
    qparams = quantize_params(params, qcfg)
    after = memory_bytes(qparams["blocks"])
    # block linears halve (bf16 -> int8 + small scales)
    assert after < before * 0.62
    # excluded top-level modules untouched
    assert "w" in qparams["patch_embedding"]
    assert "w" in qparams["head"]["head"]
    # block linears are quantized, stacked per layer
    sa = qparams["blocks"]["self_attn"]["q"]
    assert sa["w_q"].dtype == jnp.int8
    assert sa["w_q"].ndim == 3 and sa["scale"].ndim == 2


def test_quantized_e2e_close_to_bf16():
    """Full semi-AR loop with int8 weights stays close to the fp32 run."""
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    xattn = gen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    noise = jax.random.normal(
        jax.random.key(1),
        (1, 2, cfg.runtime.latent_height, cfg.runtime.latent_width,
         cfg.runtime.latent_channels), dtype=jnp.float32)
    ref, _ = gen.generate(noise, xattn, jax.random.key(2))

    qcfg = QuantConfig(enabled=True, dtype="int8", granularity="per_channel")
    qparams = quantize_params(params, qcfg)
    qgen = SemiARGenerator(cfg, qparams, dtype=jnp.float32)
    qout, _ = qgen.generate(noise, qgen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim))),
        jax.random.key(2))

    ref_np, q_np = np.asarray(ref), np.asarray(qout)
    rel = np.abs(q_np - ref_np).mean() / (np.abs(ref_np).mean() + 1e-8)
    assert np.isfinite(q_np).all()
    assert rel < 0.12, f"quantized output drifted {rel:.3f} from fp32"


def test_quantized_kv_cache_e2e():
    """int8 KV cache: loop runs, stays close to the fp32-cache run, and the
    cache arrays really are int8."""
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    ref_gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    xattn = ref_gen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    noise = jax.random.normal(
        jax.random.key(1),
        (1, 3, cfg.runtime.latent_height, cfg.runtime.latent_width,
         cfg.runtime.latent_channels), dtype=jnp.float32)
    ref, _ = ref_gen.generate(noise, xattn, jax.random.key(2))

    qcfg_engine = tiny_test_config()
    qcfg_engine.quant.enabled = True
    qcfg_engine.quant.quantize_kv_cache = True
    qgen = SemiARGenerator(qcfg_engine, params, dtype=jnp.float32)
    cache = qgen.init_cache()
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
    qout, qcache = qgen.generate(
        noise, qgen.encode_text_context(
            jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim))),
        jax.random.key(2))

    ref_np, q_np = np.asarray(ref), np.asarray(qout)
    assert np.isfinite(q_np).all()
    rel = np.abs(q_np - ref_np).mean() / (np.abs(ref_np).mean() + 1e-8)
    assert rel < 0.15, f"int8-KV output drifted {rel:.3f}"
    assert qcache.k.dtype == jnp.int8


def test_quant_quality_delta_harness():
    """End-to-end quality-delta tracking: bf16 vs int8 videos through the
    VDE metrics (the BASELINE <=0.5 VBench-delta harness, exercised at tiny
    scale with random weights)."""
    from inferix_tpu.eval.vde import quality_delta
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    vae = CausalVAE(VAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temperal_downsample=(True, True)),
                    key=jax.random.key(9))

    def gen_video(p):
        g = SemiARGenerator(cfg, p, dtype=jnp.float32)
        xattn = g.encode_text_context(
            jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1),
            (1, 4, cfg.runtime.latent_height, cfg.runtime.latent_width,
             cfg.runtime.latent_channels), jnp.float32)
        lat, _ = g.generate(noise, xattn, jax.random.key(2))
        return np.asarray(vae.decode(lat)[0] * 0.5 + 0.5)

    video_bf16 = gen_video(params)
    qcfg = QuantConfig(enabled=True, dtype="int8", granularity="per_channel")
    video_int8 = gen_video(quantize_params(params, qcfg))

    deltas = quality_delta(video_bf16, video_int8, n_chunks=4,
                           metrics=["motion", "dynamic",
                                    "subject_consistency"])
    assert all(np.isfinite(v) for v in deltas.values())
    # int8 tracks bf16: relative metric drift bounded (random weights are the
    # hardest case — real checkpoints track much tighter)
    assert deltas["dynamic"] < 0.5, deltas


def test_magi_distill_quant_to_int8_parity():
    """Load-time fp8->int8 requant tracks the fp8 dequant path closely
    (both paths quantize the same underlying weights; difference is int8
    rounding + dynamic act quant vs e4m3 act qdq)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inferix_tpu.models.magi.dit import magi_linear
    from inferix_tpu.quant.api import magi_distill_quant_to_int8

    rng = np.random.default_rng(0)
    k, n = 128, 256

    def fp8_leaf(stacked=None):
        shape = (k, n) if stacked is None else (stacked, k, n)
        w = rng.standard_normal(shape, np.float32) / np.sqrt(k)
        ws = np.abs(w).max() / 448.0
        return {
            "w_q": jnp.asarray((w / ws).astype(jnp.float8_e4m3fn.dtype
                               if hasattr(jnp.float8_e4m3fn, "dtype")
                               else "float8_e4m3fn")),
            "weight_scale": (jnp.float32(ws) if stacked is None
                             else jnp.full((stacked,), ws, jnp.float32)),
            "act_scale": jnp.full(shape[:-2] + (k,), 0.7, jnp.float32),
        }

    tree = {"a": fp8_leaf(), "stack": fp8_leaf(stacked=3),
            "plain": {"w": jnp.ones((4, 4), jnp.bfloat16)}}
    out = magi_distill_quant_to_int8(tree)
    assert out["a"]["w_q"].dtype == jnp.int8
    assert out["a"]["scale"].shape == (n,)
    assert out["stack"]["w_q"].shape == (3, k, n)
    assert out["stack"]["scale"].shape == (3, n)
    assert out["plain"]["w"].dtype == jnp.bfloat16  # untouched

    x = jnp.asarray(rng.standard_normal((16, k), np.float32), jnp.bfloat16)
    y_fp8 = magi_linear(tree["a"], x).astype(jnp.float32)
    y_i8 = magi_linear(out["a"], x).astype(jnp.float32)
    rel = float(jnp.linalg.norm(y_fp8 - y_i8) / jnp.linalg.norm(y_fp8))
    assert rel < 0.03, rel

    # per-channel smooth variant folds (input_scale / smooth) into weights
    w = rng.standard_normal((k, n), np.float32) / np.sqrt(k)
    ws = np.abs(w).max() / 448.0
    sm = {
        "w_q": jnp.asarray((w / ws).astype("float8_e4m3fn")),
        "weight_scale": jnp.float32(ws),
        "smooth_scale": jnp.asarray(rng.uniform(0.5, 2.0, (k,)), jnp.float32),
        "input_scale": jnp.float32(0.9),
    }
    y_fp8 = magi_linear(sm, x).astype(jnp.float32)
    y_i8 = magi_linear(magi_distill_quant_to_int8({"m": sm})["m"], x
                       ).astype(jnp.float32)
    rel = float(jnp.linalg.norm(y_fp8 - y_i8) / jnp.linalg.norm(y_fp8))
    assert rel < 0.03, rel
