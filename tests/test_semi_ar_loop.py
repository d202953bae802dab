"""End-to-end tests of the semi-AR denoise loop on tiny shapes
(the reference's small-config fixture pattern, `tests/configs/test_defaults.yaml`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.semi_ar import SemiARGenerator


@pytest.fixture(scope="module")
def gen():
    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    return SemiARGenerator(cfg, params, dtype=jnp.float32)


def _noise(gen, frames=None):
    r = gen.cfg.runtime
    frames = frames if frames is not None else r.num_frames
    return jax.random.normal(
        jax.random.key(1),
        (r.batch_size, frames, r.latent_height, r.latent_width,
         r.latent_channels),
        dtype=jnp.float32,
    )


def test_generate_shapes(gen):
    noise = _noise(gen, frames=4)
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    latents, cache = gen.generate(noise, xattn, jax.random.key(2))
    assert latents.shape == noise.shape
    assert np.isfinite(np.asarray(latents)).all()
    # cache should hold non-zero KV for the generated frames
    assert np.abs(np.asarray(cache.k[:, :, : gen.frame_seq])).sum() > 0


def test_deterministic(gen):
    noise = _noise(gen, frames=2)
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    a, _ = gen.generate(noise, xattn, jax.random.key(2))
    b, _ = gen.generate(noise, xattn, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_causality(gen):
    """Earlier blocks must be unaffected by later noise (semi-AR causality)."""
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    n1 = _noise(gen, frames=3)
    n2 = jnp.concatenate([n1[:, :2], n1[:, 2:] * -1.0], axis=1)
    a, _ = gen.generate(n1, xattn, jax.random.key(3))
    b, _ = gen.generate(n2, xattn, jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(a[:, :2]), np.asarray(b[:, :2]), rtol=0, atol=0
    )
    assert np.abs(np.asarray(a[:, 2]) - np.asarray(b[:, 2])).max() > 1e-6


def test_context_dependence(gen):
    """Later blocks must depend on earlier blocks through the KV cache."""
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    n1 = _noise(gen, frames=3)
    n2 = jnp.concatenate([n1[:, :1] * -1.0, n1[:, 1:]], axis=1)
    a, _ = gen.generate(n1, xattn, jax.random.key(3))
    b, _ = gen.generate(n2, xattn, jax.random.key(3))
    assert np.abs(np.asarray(a[:, 2]) - np.asarray(b[:, 2])).max() > 1e-6


def test_initial_latent_prefix(gen):
    """initial_latent frames are passed through and condition the output."""
    r = gen.cfg.runtime
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    init = jax.random.normal(
        jax.random.key(7),
        (r.batch_size, 1, r.latent_height, r.latent_width, r.latent_channels),
        dtype=jnp.float32,
    )
    noise = _noise(gen, frames=2)
    latents, _ = gen.generate(noise, xattn, jax.random.key(2),
                              initial_latent=init)
    assert latents.shape[1] == 3
    np.testing.assert_array_equal(np.asarray(latents[:, :1]), np.asarray(init))

    latents2, _ = gen.generate(noise, xattn, jax.random.key(2),
                               initial_latent=init * -1.0)
    assert np.abs(np.asarray(latents2[:, 1:]) - np.asarray(latents[:, 1:])).max() > 1e-6


def test_i2v_cross_attention_branch():
    """i2v models consume CLIP image tokens through a separate K/V branch."""
    from inferix_tpu.models.wan.causal_dit import (
        init_params, make_statics, dit_forward_inference,
        precompute_crossattn_cache,
    )
    from inferix_tpu.kvcache.cache import init_kv_cache
    from inferix_tpu.ops.rope import build_rope_tables

    cfg = tiny_test_config()
    cfg.model.model_type = "i2v"
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    assert "img_emb" in params
    assert "k_img" in params["blocks"]["cross_attn"]

    statics = make_statics(cfg.model, 1, 1, 8, 8, jnp.float32)
    tables = build_rope_tables(cfg.model.head_dim, 64)
    ctx = jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim))
    clip_a = jax.random.normal(jax.random.key(1), (1, 257, 1280)) * 0.1
    xattn_a = precompute_crossattn_cache(params, cfg.model, ctx, clip_a)
    xattn_b = precompute_crossattn_cache(params, cfg.model, ctx, clip_a * -1)
    assert xattn_a.k_img is not None

    x = jax.random.normal(jax.random.key(2), (1, 1, 8, 8, 16))
    t = jnp.zeros((1, 1))
    out_a, _ = dit_forward_inference(params, statics, tables, x, t, xattn_a,
                                     init_kv_cache(statics.spec), jnp.int32(0))
    out_b, _ = dit_forward_inference(params, statics, tables, x, t, xattn_b,
                                     init_kv_cache(statics.spec), jnp.int32(0))
    # image conditioning must influence the output
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6


def test_bidirectional_forward():
    from inferix_tpu.models.wan.causal_dit import (
        dit_forward_bidirectional, init_params, precompute_crossattn_cache,
    )
    from inferix_tpu.ops.rope import build_rope_tables

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    tables = build_rope_tables(cfg.model.head_dim, 64)
    xattn = jax.jit(
        lambda p, c: precompute_crossattn_cache(p, cfg.model, c)
    )(params, jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    x = jax.random.normal(jax.random.key(3), (1, 3, 8, 8, 16))
    t = jnp.full((1, 3), 500.0)
    flow = dit_forward_bidirectional(params, cfg.model, tables, x, t, xattn)
    assert flow.shape == x.shape
    # bidirectional: changing the LAST frame changes the FIRST frame's output
    x2 = x.at[:, 2].multiply(-1.0)
    flow2 = dit_forward_bidirectional(params, cfg.model, tables, x2, t, xattn)
    assert np.abs(np.asarray(flow[:, 0]) - np.asarray(flow2[:, 0])).max() > 1e-6


def test_rolling_window_generation():
    """local_attn_size != -1: generation past the window uses the ring cache
    (sink frames pinned, oldest evicted) and stays finite/causal."""
    cfg = tiny_test_config()
    cfg.model.local_attn_size = 3   # 3-frame rolling window
    cfg.model.sink_size = 1         # pin the first frame
    cfg.model.max_attention_frames = 3
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    assert gen.statics.spec.ring
    xattn = gen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    noise = jax.random.normal(
        jax.random.key(1),
        (1, 6, cfg.runtime.latent_height, cfg.runtime.latent_width,
         cfg.runtime.latent_channels), jnp.float32)
    latents, cache = gen.generate(noise, xattn, jax.random.key(2))
    assert latents.shape[1] == 6
    assert np.isfinite(np.asarray(latents)).all()
    # causality still holds across the window boundary
    n2 = noise.at[:, 5].multiply(-1.0)
    latents2, _ = gen.generate(n2, xattn, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(latents[:, :5]),
                                  np.asarray(latents2[:, :5]))


def test_block_causal_full_sequence():
    from inferix_tpu.models.wan.causal_dit import (
        dit_forward_block_causal, init_params, precompute_crossattn_cache,
    )
    from inferix_tpu.ops.rope import build_rope_tables

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    tables = build_rope_tables(cfg.model.head_dim, 64)
    xattn = jax.jit(
        lambda p, c: precompute_crossattn_cache(p, cfg.model, c)
    )(params, jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    x = jax.random.normal(jax.random.key(3), (1, 4, 8, 8, 16))
    t = jnp.full((1, 4), 500.0)
    flow = dit_forward_block_causal(params, cfg.model, tables, x, t, xattn,
                                    frames_per_block=2)
    assert flow.shape == x.shape
    # block-causal: later blocks do NOT affect earlier blocks
    x2 = x.at[:, 2:].multiply(-1.0)
    flow2 = dit_forward_block_causal(params, cfg.model, tables, x2, t, xattn,
                                     frames_per_block=2)
    np.testing.assert_array_equal(np.asarray(flow[:, :2]),
                                  np.asarray(flow2[:, :2]))
    assert np.abs(np.asarray(flow[:, 2:]) - np.asarray(flow2[:, 2:])).max() > 0


def test_teacher_forcing_uses_clean_context():
    from inferix_tpu.models.wan.causal_dit import (
        dit_forward_teacher_forcing, init_params, precompute_crossattn_cache,
    )
    from inferix_tpu.ops.rope import build_rope_tables

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    tables = build_rope_tables(cfg.model.head_dim, 64)
    xattn = jax.jit(
        lambda p, c: precompute_crossattn_cache(p, cfg.model, c)
    )(params, jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    noisy = jax.random.normal(jax.random.key(4), (1, 4, 8, 8, 16))
    clean = jax.random.normal(jax.random.key(5), (1, 4, 8, 8, 16))
    t = jnp.full((1, 4), 700.0)
    a = dit_forward_teacher_forcing(params, cfg.model, tables, noisy, clean,
                                    t, xattn, frames_per_block=2)
    # block 1's prediction depends on block 0's CLEAN context...
    b = dit_forward_teacher_forcing(params, cfg.model, tables, noisy,
                                    clean.at[:, :2].multiply(-1.0), t, xattn,
                                    frames_per_block=2)
    assert np.abs(np.asarray(a[:, 2:]) - np.asarray(b[:, 2:])).max() > 1e-6
    # ...but block 0's prediction is independent of the clean tensor
    np.testing.assert_array_equal(np.asarray(a[:, :2]), np.asarray(b[:, :2]))


def test_unroll_layers_matches_scan():
    """The unrolled layer loop computes exactly the same function."""
    cfg_a = tiny_test_config()
    cfg_b = tiny_test_config()
    cfg_b.model.unroll_layers = True
    params = init_params(jax.random.key(0), cfg_a.model, dtype=jnp.float32)
    noise = jax.random.normal(
        jax.random.key(1),
        (1, 2, cfg_a.runtime.latent_height, cfg_a.runtime.latent_width,
         cfg_a.runtime.latent_channels), jnp.float32)
    outs = []
    for cfg in (cfg_a, cfg_b):
        g = SemiARGenerator(cfg, params, dtype=jnp.float32)
        xattn = g.encode_text_context(
            jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
        lat, _ = g.generate(noise, xattn, jax.random.key(2))
        outs.append(np.asarray(lat))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)


def test_fused_qkv_matches_separate():
    """fuse_qkv_params is numerically identical to separate q/k/v projections
    (bf16 leaves and int8-quantized leaves)."""
    from inferix_tpu.models.wan.causal_dit import fuse_qkv_params
    from inferix_tpu.quant.api import quantize_params

    cfg = tiny_test_config()
    cfg.model.fuse_qkv = False
    params = init_params(jax.random.key(5), cfg.model, dtype=jnp.float32)
    noise = jax.random.normal(
        jax.random.key(6),
        (1, 2, cfg.runtime.latent_height, cfg.runtime.latent_width,
         cfg.runtime.latent_channels), dtype=jnp.float32)
    ctx = jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim))

    gen_sep = SemiARGenerator(cfg, params, dtype=jnp.float32)
    xattn = gen_sep.encode_text_context(ctx)
    a, _ = gen_sep.generate(noise, xattn, jax.random.key(7))

    fcfg = tiny_test_config()
    fcfg.model.fuse_qkv = True
    gen_fused = SemiARGenerator(fcfg, params, dtype=jnp.float32)
    assert "qkv" in gen_fused.params["blocks"]["self_attn"]
    assert "q" not in gen_fused.params["blocks"]["self_attn"]
    b, _ = gen_fused.generate(noise, xattn, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)

    # quantized leaves: fuse after quantization, same int8 numerics
    qcfg = tiny_test_config()
    qcfg.quant.enabled = True
    qcfg.quant.dtype = "int8"
    qcfg.quant.granularity = "per_channel"
    qparams = quantize_params(params, qcfg.quant)
    qcfg.model.fuse_qkv = False
    gq_sep = SemiARGenerator(qcfg, qparams, dtype=jnp.float32)
    qa, _ = gq_sep.generate(noise, xattn, jax.random.key(7))
    fused_q = fuse_qkv_params(qparams)
    assert fused_q["blocks"]["self_attn"]["qkv"]["w_q"].dtype == jnp.int8
    q2cfg = tiny_test_config()
    q2cfg.quant.enabled = True
    q2cfg.quant.dtype = "int8"
    q2cfg.quant.granularity = "per_channel"
    q2cfg.model.fuse_qkv = True
    gq_fused = SemiARGenerator(q2cfg, qparams, dtype=jnp.float32)
    qb, _ = gq_fused.generate(noise, xattn, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                               rtol=2e-5, atol=2e-5)


def test_last_step_context_mode(gen):
    """context_mode='last_step' skips the context re-run: first-block x0 is
    bit-identical to the default (same denoise math + rng stream), the cache
    content differs (KV from the final denoise step, not a clean re-run),
    and multi-block generation stays finite."""
    import dataclasses

    from inferix_tpu.core.config import tiny_test_config

    cfg = tiny_test_config()
    cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
    fast = SemiARGenerator(cfg, gen.params, dtype=jnp.float32)

    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    noise = _noise(gen, frames=1)

    x0_ref, cache_ref = gen.denoise_block(
        gen.init_cache(), xattn, noise, jax.random.key(5), 0)
    x0_fast, cache_fast = fast.denoise_block(
        fast.init_cache(), xattn, noise, jax.random.key(5), 0)
    np.testing.assert_array_equal(np.asarray(x0_ref), np.asarray(x0_fast))
    # the persisted KV must be populated but NOT equal to the clean re-run's
    assert np.abs(np.asarray(cache_fast.k[:, :, : fast.frame_seq])).sum() > 0
    assert not np.allclose(np.asarray(cache_ref.k[:, :, : fast.frame_seq]),
                           np.asarray(cache_fast.k[:, :, : fast.frame_seq]))

    latents, _ = fast.generate(_noise(gen, frames=4), xattn, jax.random.key(6))
    assert latents.shape[1] == 4
    assert np.isfinite(np.asarray(latents)).all()


def test_last_step_mode_rejects_bad_value():
    import dataclasses

    from inferix_tpu.core.config import tiny_test_config

    cfg = tiny_test_config()
    cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="bogus")
    with pytest.raises(ValueError):
        SemiARGenerator(cfg, init_params(jax.random.key(0), cfg.model,
                                         dtype=jnp.float32),
                        dtype=jnp.float32)

def test_span_grid_bound_and_threading(gen):
    """RuntimeConfig.span_grid: the bucketed host bound must be a correct
    upper bound on the live prefix (pow2 block buckets, capped at the
    cache size), return None for traced starts (continuous batching), and
    thread through the jitted dispatches without changing the XLA-path
    output (on CPU the hint is accepted and ignored)."""
    bt = gen.statics.geo.tokens
    fpb = gen.statics.geo.frames
    mt = gen.statics.spec.max_tokens
    gen.span_grid = True
    try:
        # block 0 -> 1 block; block 2 -> 4-block bucket; always >= live
        # end. A bucket reaching the cache size folds to None (the default
        # full-grid program IS that computation — no twin compile).
        for blk in range(mt // bt):
            start_frame = blk * fpb
            bound = gen._span_bound(start_frame, fpb)
            end = start_frame * gen.frame_seq + bt
            nblk = -(-end // bt)
            p2 = 1 << (nblk - 1).bit_length()
            if p2 * bt >= mt:
                assert bound is None, (blk, bound)
            else:
                assert bound == p2 * bt and bound >= end, (blk, bound)
        # traced / per-stream starts opt out
        assert gen._span_bound(jnp.int32(0), fpb) is None
        assert gen._span_bound(np.int64(0), fpb) is not None
        # "ttfb" mode: trimmed grids only while the bucket is <= half the
        # cache; later blocks use the default program (None)
        gen.span_grid = "ttfb"
        saw_bound = saw_none = False
        for blk in range(mt // bt):
            b = gen._span_bound(blk * fpb, fpb)
            if b is None:
                saw_none = True
            else:
                saw_bound = True
                assert b <= mt // 2
        assert saw_bound and saw_none
        from inferix_tpu.pipeline.semi_ar import span_bucket
        assert span_bucket(0, bt, mt) == bt
        assert span_bucket(0, bt, mt, ttfb_only=True) == bt
        assert span_bucket(mt - bt, bt, mt) is None
        assert span_bucket(mt - bt, bt, mt, ttfb_only=True) is None
    finally:
        gen.span_grid = False

    # threading: same x0 with and without a max_span static
    noise = _noise(gen, frames=fpb)
    xattn = gen.encode_text_context(
        jnp.zeros((1, gen.cfg.model.text_len, gen.cfg.model.text_dim)))
    cache = gen.init_cache()
    start = jnp.int32(0)
    a = gen._steps_only(gen.params, gen.rope_tables, gen.schedule, cache,
                        xattn, noise, jax.random.key(3), start,
                        max_span=None)
    b = gen._steps_only(gen.params, gen.rope_tables, gen.schedule, cache,
                        xattn, noise, jax.random.key(3), start,
                        max_span=bt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
