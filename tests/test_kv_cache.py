"""Ring-buffer KV cache semantics vs the reference's shift-eviction model
(`inferix/models/self_forcing/causal_model.py:279-304`): after writing
positions [0, end), the live set must equal {sink tokens} U {last `window`
tokens}, and attention over the cache must equal attention over exactly that
live set."""
import jax
import jax.numpy as jnp
import numpy as np

from inferix_tpu.kvcache.cache import (
    KVCacheSpec,
    init_kv_cache,
    position_to_slot,
    valid_mask,
    write_block,
)


def _spec(max_tokens=8, sink=2, ring=True):
    return KVCacheSpec(
        num_layers=1, batch=1, max_tokens=max_tokens, num_kv_heads=1,
        head_dim=4, sink_tokens=sink, ring=ring, dtype=jnp.float32,
    )


def _payload(positions, d=4):
    """Encode each position p as the vector [p, p, p, p]."""
    out = np.zeros((1, len(positions), 1, d), np.float32)
    for i, p in enumerate(positions):
        out[0, i, :, :] = p
    return jnp.asarray(out)


def _write_range(spec, k, v, start, end):
    block = list(range(start, end))
    kn = _payload(block)
    return write_block(spec, k, v, kn, kn, jnp.int32(start))


def live_positions(spec, k, end):
    mask = np.asarray(valid_mask(spec, jnp.int32(end)))
    vals = np.asarray(k[0, :, 0, 0])
    return sorted(int(vals[j]) for j in range(spec.max_tokens) if mask[j])


def test_no_ring_contiguous():
    spec = _spec(max_tokens=8, sink=0, ring=False)
    cache = init_kv_cache(spec)
    k, v = cache.k[0], cache.v[0]
    k, v = _write_range(spec, k, v, 0, 3)
    k, v = _write_range(spec, k, v, 3, 6)
    assert live_positions(spec, k, 6) == [0, 1, 2, 3, 4, 5]


def test_rewrite_same_block_idempotent():
    """Inner denoise steps rewrite the same slots; live set is unchanged."""
    spec = _spec(max_tokens=8, sink=0, ring=False)
    cache = init_kv_cache(spec)
    k, v = cache.k[0], cache.v[0]
    for _ in range(3):
        k, v = _write_range(spec, k, v, 0, 3)
    assert live_positions(spec, k, 3) == [0, 1, 2]


def test_ring_eviction_with_sink():
    """Window cap 8 with 2 sink tokens: after writing [0, 12), live set =
    {0, 1} (sink) U {6..11} (last ring=6 tokens)."""
    spec = _spec(max_tokens=8, sink=2, ring=True)
    cache = init_kv_cache(spec)
    k, v = cache.k[0], cache.v[0]
    for s in range(0, 12, 2):
        k, v = _write_range(spec, k, v, s, s + 2)
    assert live_positions(spec, k, 12) == [0, 1, 6, 7, 8, 9, 10, 11]


def test_ring_eviction_no_sink():
    spec = _spec(max_tokens=6, sink=0, ring=True)
    cache = init_kv_cache(spec)
    k, v = cache.k[0], cache.v[0]
    for s in range(0, 9, 3):
        k, v = _write_range(spec, k, v, s, s + 3)
    assert live_positions(spec, k, 9) == [3, 4, 5, 6, 7, 8]


def test_slot_mapping_pure():
    spec = _spec(max_tokens=8, sink=2, ring=True)
    pos = jnp.arange(20)
    slots = np.asarray(position_to_slot(spec, pos))
    # below cap: identity
    np.testing.assert_array_equal(slots[:8], np.arange(8))
    # beyond: cycles through ring region [2, 8)
    assert set(slots[8:]) <= set(range(2, 8))
    # consecutive overflow positions occupy distinct slots within a window
    for s in range(8, 14):
        window = slots[s : s + 6]
        assert len(set(window.tolist())) == 6


def test_valid_mask_before_fill():
    spec = _spec(max_tokens=8, sink=0, ring=True)
    mask = np.asarray(valid_mask(spec, jnp.int32(3)))
    np.testing.assert_array_equal(mask, np.arange(8) < 3)
    mask_full = np.asarray(valid_mask(spec, jnp.int32(100)))
    assert mask_full.all()


def test_fp8_kv_cache_end_to_end():
    """Scale-free fp8 e4m3 KV cache: half HBM, cast-only dequant. Generation
    through the fp8 cache must stay close to the bf16-cache path (e4m3 holds
    ~2 decimal digits; attention outputs are O(1))."""
    import copy

    import jax
    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)

    def run(kv_dtype_cfg):
        c = copy.deepcopy(cfg)
        if kv_dtype_cfg:
            c.quant.enabled = True
            c.quant.quantize_kv_cache = True
            c.quant.kv_cache_dtype = kv_dtype_cfg
            # weights stay full precision: isolate the cache effect
            c.quant.exclude = ("self_attn", "cross_attn", "ffn",
                               "text_embedding", "head", "patch_embedding",
                               "time_")
        gen = SemiARGenerator(c, params, dtype=jnp.float32)
        m, r = c.model, c.runtime
        xattn = gen.encode_text_context(
            jnp.zeros((1, m.text_len, m.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1), (1, 4, r.latent_height, r.latent_width,
                                r.latent_channels))
        latents, cache = gen.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents), cache

    base, _ = run(None)
    fp8, cache = run("fp8")
    assert cache.k.dtype == jnp.float8_e4m3fn
    assert cache.k_scale is None
    assert np.isfinite(fp8).all()
    rel = np.abs(fp8 - base).max() / (np.abs(base).max() + 1e-8)
    assert rel < 0.15, f"fp8 KV cache drift {rel:.3f}"


def test_ring_granule_dus_matches_scatter():
    """The frame-granule DUS lowering (KVCacheSpec.granule — the fix for
    the ring scatter's whole-cache layout copies) writes exactly what the
    scatter fallback writes, for scalar and per-slot starts, wrap and
    straddle included; non-granule-aligned lengths fall back to scatter."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from inferix_tpu.kvcache.cache import KVCacheSpec, _write_one

    g = 8  # granule (frame_seq)
    spec_dus = KVCacheSpec(num_layers=1, batch=2, max_tokens=6 * g,
                           num_kv_heads=2, head_dim=4, sink_tokens=g,
                           ring=True, granule=g)
    spec_sc = dataclasses.replace(spec_dus, granule=0)

    cache0 = jnp.zeros((2, 6 * g, 2, 4), jnp.float32)
    rng = np.random.default_rng(0)

    def block(n):
        return jnp.asarray(rng.standard_normal((2, n, 2, 4)), jnp.float32)

    # scalar starts: pre-wrap, straddling max_tokens, deep in the ring
    for start in (0, 4 * g, 5 * g, 9 * g, 13 * g):
        new = block(3 * g)
        a = _write_one(spec_dus, cache0, new, jnp.int32(start))
        b = _write_one(spec_sc, cache0, new, jnp.int32(start))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # per-slot starts (continuous batching)
    starts = jnp.asarray([2 * g, 11 * g], jnp.int32)
    new = block(2 * g)
    a = _write_one(spec_dus, cache0, new, starts)
    b = _write_one(spec_sc, cache0, new, starts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-granule-multiple length -> both take the scatter path
    new = block(g + 3)
    a = _write_one(spec_dus, cache0, new, jnp.int32(7 * g))
    b = _write_one(spec_sc, cache0, new, jnp.int32(7 * g))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Head-major layout (KVCacheSpec.head_major): [B, H, S, D] storage must hold
# exactly the same logical content as the token-major cache
# ---------------------------------------------------------------------------

def _hm_pair(max_tokens=12, sink=2, ring=True, quantized=False, batch=2,
             heads=3, granule=0):
    kw = dict(num_layers=1, batch=batch, max_tokens=max_tokens,
              num_kv_heads=heads, head_dim=4, sink_tokens=sink, ring=ring,
              dtype=jnp.float32, quantized=quantized, granule=granule)
    return (KVCacheSpec(**kw), KVCacheSpec(**kw, head_major=True))


def _rand_block(key, batch, n, heads, d=4):
    return jax.random.normal(key, (batch, n, heads, d), jnp.float32)


def test_head_major_write_matches_token_major():
    """Every write path (contiguous, ring scatter, ring granule DUS,
    per-stream vector starts) must produce the transposed image of the
    token-major cache."""
    key = jax.random.key(0)
    for ring, granule, vec_start in [(False, 0, False), (True, 0, False),
                                     (True, 2, False), (False, 0, True)]:
        spec, spec_hm = _hm_pair(max_tokens=12, sink=2 if ring else 0,
                                 ring=ring, granule=granule)
        c = init_kv_cache(spec)
        c_hm = init_kv_cache(spec_hm)
        k, v = c.k[0], c.v[0]
        kh, vh = c_hm.k[0], c_hm.v[0]
        for i, start in enumerate([0, 4, 8, 12, 16]):
            if granule and start % granule:
                continue
            blk = _rand_block(jax.random.fold_in(key, i), spec.batch, 4,
                              spec.num_kv_heads)
            st = (jnp.array([start, start + 4], jnp.int32) if vec_start
                  else jnp.int32(start))
            if vec_start and (start + 8) > spec.max_tokens:
                continue
            k, v = write_block(spec, k, v, blk, blk, st)
            kh, vh = write_block(spec_hm, kh, vh, blk, blk, st)
            np.testing.assert_array_equal(
                np.asarray(kh), np.asarray(k).transpose(0, 2, 1, 3))
            np.testing.assert_array_equal(
                np.asarray(vh), np.asarray(v).transpose(0, 2, 1, 3))


def test_head_major_quantized_write_matches():
    """Quantized head-major: int8 values and the [B, H, S] scale cache must
    be the transposed image of the token-major ones."""
    key = jax.random.key(7)
    spec, spec_hm = _hm_pair(ring=True, granule=2, quantized=True)
    c = init_kv_cache(spec)
    c_hm = init_kv_cache(spec_hm)
    k, v, ks, vs = c.k[0], c.v[0], c.k_scale[0], c.v_scale[0]
    kh, vh, ksh, vsh = (c_hm.k[0], c_hm.v[0],
                        c_hm.k_scale[0], c_hm.v_scale[0])
    assert kh.shape == (2, 3, 12, 4) and ksh.shape == (2, 3, 12)
    for i, start in enumerate([0, 4, 8, 12]):
        blk = _rand_block(jax.random.fold_in(key, i), 2, 4, 3)
        k, v, ks, vs = write_block(spec, k, v, blk, blk, jnp.int32(start),
                                   ks, vs)
        kh, vh, ksh, vsh = write_block(spec_hm, kh, vh, blk, blk,
                                       jnp.int32(start), ksh, vsh)
        np.testing.assert_array_equal(
            np.asarray(kh), np.asarray(k).transpose(0, 2, 1, 3))
        np.testing.assert_array_equal(
            np.asarray(ksh), np.asarray(ks).transpose(0, 2, 1))
        np.testing.assert_array_equal(
            np.asarray(vsh), np.asarray(vs).transpose(0, 2, 1))


def test_head_major_generation_matches_token_major():
    """Full semi-AR generation with kv_head_major=True equals the default
    layout bit-for-bit (CPU: the XLA fallback transposes back; on TPU the
    Pallas fold consumes the head-major cache directly)."""
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    def gen(cfg):
        g = SemiARGenerator(cfg, params, dtype=jnp.float32)
        r, m = cfg.runtime, cfg.model
        xattn = g.encode_text_context(
            jax.random.normal(jax.random.key(7),
                              (r.batch_size, m.text_len, m.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1),
            (r.batch_size, 3, r.latent_height, r.latent_width,
             r.latent_channels))
        latents, _ = g.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents)

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base = gen(cfg)
    cfg_hm = copy.deepcopy(cfg)
    cfg_hm.runtime.kv_head_major = True
    got = gen(cfg_hm)
    np.testing.assert_array_equal(got, base)


def test_head_major_quantized_generation_matches():
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    def gen(cfg):
        g = SemiARGenerator(cfg, params, dtype=jnp.float32)
        r, m = cfg.runtime, cfg.model
        xattn = g.encode_text_context(
            jax.random.normal(jax.random.key(7),
                              (r.batch_size, m.text_len, m.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1),
            (r.batch_size, 3, r.latent_height, r.latent_width,
             r.latent_channels))
        latents, _ = g.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents)

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base = gen(cfg)
    cfg_hm = copy.deepcopy(cfg)
    cfg_hm.runtime.kv_head_major = True
    got = gen(cfg_hm)
    np.testing.assert_array_equal(got, base)


def test_magi_head_major_walk_matches():
    """MAGI windowed walk with the head-major int8 window cache equals the
    token-major walk bit-for-bit, including the 3-CFG path (sync_cache_rows
    must copy the same token span on the transposed layout)."""
    import dataclasses as _dc

    from inferix_tpu.models.magi.dit import init_magi_params, tiny_magi_config
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    mcfg = tiny_magi_config()
    params = init_magi_params(jax.random.key(3), mcfg, jnp.float32)
    cap = jnp.ones((1, mcfg.caption_max_length, mcfg.caption_channels),
                   jnp.float32) * 0.1
    cmask = jnp.ones((1, mcfg.caption_max_length), jnp.int32)

    for cfg_number in (1, 3):
        rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2,
                               cfg_number=cfg_number, quantize_kv=True)
        base_pipe = MagiPipeline(mcfg, rt, params=params, latent_h=8,
                                 latent_w=8, max_chunks=6, dtype=jnp.float32)
        base = [np.asarray(lat) for _, lat in
                base_pipe.generate_chunks(cap, cmask, chunk_num=3)]

        rt_hm = _dc.replace(rt, kv_head_major=True)
        hm_pipe = MagiPipeline(mcfg, rt_hm, params=params, latent_h=8,
                               latent_w=8, max_chunks=6, dtype=jnp.float32)
        assert hm_pipe.statics.spec.head_major
        got = [np.asarray(lat) for _, lat in
               hm_pipe.generate_chunks(cap, cmask, chunk_num=3)]
        assert len(got) == len(base)
        for a, g in zip(base, got):
            np.testing.assert_array_equal(g, a)


def test_head_major_fp8_generation_matches():
    """Scale-free fp8 e4m3 cache x head-major: bit-equal to the token-major
    fp8 run (cast-only dequant is elementwise, so layout can't change it)."""
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    def gen(cfg):
        g = SemiARGenerator(cfg, params, dtype=jnp.float32)
        assert g.statics.spec.dtype == jnp.float8_e4m3fn
        r, m = cfg.runtime, cfg.model
        xattn = g.encode_text_context(
            jax.random.normal(jax.random.key(7),
                              (r.batch_size, m.text_len, m.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1),
            (r.batch_size, 3, r.latent_height, r.latent_width,
             r.latent_channels))
        latents, _ = g.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents)

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    cfg.quant.kv_cache_dtype = "fp8"
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base = gen(cfg)
    cfg_hm = copy.deepcopy(cfg)
    cfg_hm.runtime.kv_head_major = True
    got = gen(cfg_hm)
    np.testing.assert_array_equal(got, base)


# ---------------------------------------------------------------------------
# Pad-free allocation (KVCacheSpec.alloc_tokens): the physical slot count is
# rounded up to the flash kernel's kv_block so the kernel's per-layer K/V
# pads become no-ops (~9 ms/forward at the 1.3B full-cache shape,
# exp/r6_results/op_breakdown.log %pad.83/84). The pad rows are never
# written or attended, so generation must be bit-equal in every cache
# configuration.
# ---------------------------------------------------------------------------

def _gen_wan(cfg, params):
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    g = SemiARGenerator(cfg, params, dtype=jnp.float32)
    r, m = cfg.runtime, cfg.model
    xattn = g.encode_text_context(
        jax.random.normal(jax.random.key(7),
                          (r.batch_size, m.text_len, m.text_dim)))
    noise = jax.random.normal(
        jax.random.key(1),
        (r.batch_size, 3, r.latent_height, r.latent_width,
         r.latent_channels))
    latents, _ = g.generate(noise, xattn, jax.random.key(2))
    return np.asarray(latents), g.statics.spec


def test_alloc_pad_spec_rounding():
    from inferix_tpu.models.wan.causal_dit import make_kv_spec
    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.kvcache.cache import init_kv_cache

    m = tiny_test_config().model
    spec = make_kv_spec(m, 1, 8, 16, jnp.float32, alloc_multiple=2048)
    assert spec.slots == 2048 and spec.slots >= spec.max_tokens
    assert spec.alloc_tokens % 2048 == 0
    c = init_kv_cache(spec)
    assert c.k.shape[2] == spec.slots
    # default: no padding, slots == logical window
    spec0 = make_kv_spec(m, 1, 8, 16, jnp.float32)
    assert spec0.slots == spec0.max_tokens and spec0.alloc_tokens == 0


def test_alloc_pad_generation_matches():
    """kv_alloc_pad=True (slots rounded to 2048) generates bit-identically
    to the exact-size cache."""
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base, spec0 = _gen_wan(cfg, params)
    cfg_p = copy.deepcopy(cfg)
    cfg_p.runtime.kv_alloc_pad = True
    got, spec1 = _gen_wan(cfg_p, params)
    assert spec1.slots > spec1.max_tokens == spec0.max_tokens
    np.testing.assert_array_equal(got, base)


def test_alloc_pad_composes_with_int8_head_major():
    """alloc padding x int8(+scales) x head-major: all three cache options
    together still generate bit-identically to the plain exact-size run's
    quantized baseline."""
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base, _ = _gen_wan(cfg, params)
    cfg_p = copy.deepcopy(cfg)
    cfg_p.runtime.kv_alloc_pad = True
    cfg_p.runtime.kv_head_major = True
    got, spec = _gen_wan(cfg_p, params)
    assert spec.head_major and spec.slots > spec.max_tokens
    assert spec.quantized
    np.testing.assert_array_equal(got, base)


def test_alloc_pad_rolling_window_matches():
    """Ring cache + alloc padding: slot arithmetic stays on the LOGICAL
    window (ring wraps at max_tokens, not at the padded slot count), so the
    rolling-window generation is unchanged."""
    import copy

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    def gen(cfg, params):
        g = SemiARGenerator(cfg, params, dtype=jnp.float32)
        assert g.statics.spec.ring
        r, m = cfg.runtime, cfg.model
        xattn = g.encode_text_context(
            jnp.zeros((1, m.text_len, m.text_dim)))
        noise = jax.random.normal(
            jax.random.key(1),
            (1, 6, r.latent_height, r.latent_width, r.latent_channels),
            jnp.float32)
        latents, _ = g.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents), g.statics.spec

    cfg = tiny_test_config()
    cfg.model.local_attn_size = 3
    cfg.model.sink_size = 1
    cfg.model.max_attention_frames = 3
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    base, _ = gen(cfg, params)
    cfg_p = copy.deepcopy(cfg)
    cfg_p.runtime.kv_alloc_pad = True
    got, spec = gen(cfg_p, params)
    assert spec.slots > spec.max_tokens
    np.testing.assert_array_equal(got, base)


def test_magi_alloc_pad_walk_matches():
    """MAGI windowed walk (incl. 3-CFG) with the padded int8 window cache is
    bit-equal to the exact-size walk: spans address logical tokens only."""
    import dataclasses as _dc

    from inferix_tpu.models.magi.dit import init_magi_params, tiny_magi_config
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    mcfg = tiny_magi_config()
    params = init_magi_params(jax.random.key(3), mcfg, jnp.float32)
    cap = jnp.ones((1, mcfg.caption_max_length, mcfg.caption_channels),
                   jnp.float32) * 0.1
    cmask = jnp.ones((1, mcfg.caption_max_length), jnp.int32)

    rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2,
                           cfg_number=3, quantize_kv=True)
    base_pipe = MagiPipeline(mcfg, rt, params=params, latent_h=8,
                             latent_w=8, max_chunks=6, dtype=jnp.float32)
    base = [np.asarray(lat) for _, lat in
            base_pipe.generate_chunks(cap, cmask, chunk_num=3)]

    rt_p = _dc.replace(rt, kv_alloc_pad=True)
    pad_pipe = MagiPipeline(mcfg, rt_p, params=params, latent_h=8,
                            latent_w=8, max_chunks=6, dtype=jnp.float32)
    spec = pad_pipe.statics.spec
    assert spec.slots > spec.max_tokens
    got = [np.asarray(lat) for _, lat in
           pad_pipe.generate_chunks(cap, cmask, chunk_num=3)]
    assert len(got) == len(base)
    for a, g in zip(base, got):
        np.testing.assert_array_equal(g, a)
