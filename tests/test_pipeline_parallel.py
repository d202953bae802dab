"""Real microbatched pipeline parallelism: correctness, stage-local
compute (FLOPs don't scale with pp), and per-layer state (KV cache)
threading — VERDICT round-1 item 4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import ParallelConfig
from inferix_tpu.parallel.mesh import make_mesh
from inferix_tpu.parallel.pipeline_parallel import pp_pipeline, pp_scan_layers


def _layer_fn_nostate(p, s, h):
    return jnp.tanh(h @ p["w"] + p["b"]), s


def _make(L=8, d=16, m=4, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, d)) * 0.1, jnp.float32),
    }
    mb = jnp.asarray(rng.standard_normal((m, 2, d)), jnp.float32)
    return params, mb


def _sequential(params, mb):
    outs = []
    for i in range(mb.shape[0]):
        h = mb[i]
        for l in range(params["w"].shape[0]):
            h, _ = _layer_fn_nostate(
                {"w": params["w"][l], "b": params["b"][l]}, None, h)
        outs.append(h)
    return jnp.stack(outs)


@pytest.mark.parametrize("pp,m", [(2, 4), (4, 4), (2, 1), (4, 2), (1, 3)])
def test_pp_pipeline_matches_sequential(pp, m):
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=pp))
    params, mb = _make(m=m)
    want = _sequential(params, mb)
    got, _ = pp_pipeline(mesh, _layer_fn_nostate, params, mb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pp_scan_layers_matches_sequential():
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=4))
    params, mb = _make(m=1)
    want = _sequential(params, mb)[0]

    got = pp_scan_layers(
        mesh, lambda p, h: _layer_fn_nostate(p, None, h)[0], params, mb[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pp_pipeline_threads_layer_state():
    """Per-layer state (the KV-cache analog) updates once per (layer,
    microbatch) and bubble ticks don't corrupt it."""
    pp, m, L, d = 2, 3, 4, 8
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=pp))
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((L, d, d)) * 0.2,
                               jnp.float32),
              "b": jnp.zeros((L, d), jnp.float32)}
    # state: per-layer accumulator of the activations seen by that layer
    state = jnp.zeros((L, d), jnp.float32)
    mb = jnp.asarray(rng.standard_normal((m, 2, d)), jnp.float32)

    def layer_fn(p, s, h):
        out = jnp.tanh(h @ p["w"] + p["b"])
        return out, s + jnp.sum(h, axis=0)

    # sequential oracle
    want_state = np.zeros((L, d), np.float32)
    outs = []
    for i in range(m):
        h = mb[i]
        for l in range(L):
            want_state[l] += np.asarray(jnp.sum(h, axis=0))
            h = jnp.tanh(h @ params["w"][l] + params["b"][l])
        outs.append(h)
    want = jnp.stack(outs)

    got, got_state = pp_pipeline(mesh, layer_fn, params, mb,
                                 layer_state=state)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state), want_state,
                               rtol=1e-5, atol=1e-5)


def test_pp_compute_is_stage_local():
    """Total per-device layer-matmul FLOPs must NOT scale with pp (the
    round-1 implementation evaluated run_local on every stage -> pp x
    redundant FLOPs). We count flops from the compiled module; at pp=2 each
    device compiles the layer body with the LOCAL L/pp slice, so its flop
    count must be well under the pp=1 count (bubble ticks add < pp/m)."""
    L, d, m = 8, 64, 4
    params, mb = _make(L=L, d=d, m=m)

    def flops_for(pp):
        mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=pp))
        fn = jax.jit(lambda p, x: pp_pipeline(mesh, _layer_fn_nostate,
                                              p, x)[0])
        comp = fn.lower(params, mb).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops", 0.0)

    f1 = flops_for(1)
    f2 = flops_for(2)
    assert f1 > 0
    # pp=2: per-device layer work = (m + pp - 1)/m * 1/pp of the total
    # (cond bubble branches may still be counted statically) = 0.625 x f1
    # for m=4. The broken both-sides evaluation would give >= 2 x f1.
    assert f2 < 0.9 * f1, (f1, f2)


def test_magi_walk_pp2_matches_single_device():
    """The MAGI chunk walk at pp=2 (layer stack pipelined over stages,
    CFG halves as microbatches) matches the single-device walk."""
    import jax

    from inferix_tpu.models.magi.dit import (
        init_magi_params, tiny_magi_config)
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    cfg = tiny_magi_config()
    rt = MagiRuntimeConfig(num_steps=2, window_size=2, chunk_width=2,
                           cfg_number=1)
    params = init_magi_params(jax.random.key(0), cfg, jnp.float32)
    cap = jax.random.normal(jax.random.key(1),
                            (1, cfg.caption_max_length, cfg.caption_channels))
    cmask = jnp.ones((1, cfg.caption_max_length))

    def run(mesh):
        pipe = MagiPipeline(cfg, rt, params=params, latent_h=8, latent_w=8,
                            max_chunks=4, mesh=mesh)
        chunks = dict(pipe.generate_chunks(cap, cmask, chunk_num=3,
                                           rng=jax.random.key(2)))
        return chunks

    base = run(None)
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=2))
    got = run(mesh)
    assert base.keys() == got.keys() and len(base) == 3
    for k in base:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(base[k]),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"chunk {k}")


def test_wan_semi_ar_pp2_matches_single_device():
    """The flagship semi-AR generation at pp=2 (layer stack + KV cache
    sharded over stages, batch rows as microbatches) matches single-device;
    stage compute is local (the round-1 storage-only sharding is gone)."""
    import copy

    import jax

    from inferix_tpu.core.config import tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    cfg = tiny_test_config()
    cfg.runtime.batch_size = 2
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)

    def run(mesh):
        gen = SemiARGenerator(cfg, params, dtype=jnp.float32, mesh=mesh)
        m, r = cfg.model, cfg.runtime
        xattn = gen.encode_text_context(
            jax.random.normal(jax.random.key(7),
                              (2, m.text_len, m.text_dim)) * 0.1)
        noise = jax.random.normal(
            jax.random.key(1), (2, 3, r.latent_height, r.latent_width,
                                r.latent_channels))
        latents, _ = gen.generate(noise, xattn, jax.random.key(2))
        return np.asarray(latents)

    base = run(None)
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=2, sp_mode="none"))
    got = run(mesh)
    np.testing.assert_allclose(got, base, rtol=5e-4, atol=5e-4)


def test_magi_walk_pp2_head_major_matches_token_major():
    """pp=2 over the HEAD-MAJOR window cache equals pp=2 over the
    token-major cache bit-for-bit (the pp layer_state slices the batch
    axis only; _magi_layer and sync_cache_rows handle the layout)."""
    import dataclasses as _dc

    import jax

    from inferix_tpu.models.magi.dit import (
        init_magi_params, tiny_magi_config)
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    cfg = tiny_magi_config()
    rt = MagiRuntimeConfig(num_steps=2, window_size=2, chunk_width=2,
                           cfg_number=1)
    params = init_magi_params(jax.random.key(0), cfg, jnp.float32)
    cap = jax.random.normal(jax.random.key(1),
                            (1, cfg.caption_max_length, cfg.caption_channels))
    cmask = jnp.ones((1, cfg.caption_max_length))
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=2))

    def run(rt_):
        pipe = MagiPipeline(cfg, rt_, params=params, latent_h=8, latent_w=8,
                            max_chunks=4, mesh=mesh)
        return dict(pipe.generate_chunks(cap, cmask, chunk_num=3,
                                         rng=jax.random.key(2)))

    base = run(rt)
    got = run(_dc.replace(rt, kv_head_major=True))
    assert base.keys() == got.keys() and len(base) == 3
    for k in base:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(base[k]),
                                      err_msg=f"chunk {k}")


# ---------------------------------------------------------------------------
# Composed tp x pp (partially-manual pipeline; VERDICT round-4 item 3)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pcfg,tag", [
    (ParallelConfig(dp=1, sp=1, tp=2, pp=2), "tp2xpp2"),
    (ParallelConfig(dp=1, sp=2, tp=2, pp=2), "tp2xsp2xpp2"),
])
def test_magi_composed_tp_pp_walk_matches_single_device(pcfg, tag):
    """The composed 24B deployment layout (per-chunk AOT table,
    BASELINE.md round 4): cfg3 walk with per-chunk dispatch through the
    PARTIALLY-manual pp pipeline — GSPMD tp matmuls + nested (tp, sp)
    attention islands inside the stage body, 24B architecture switches on
    (SwiGLU via the gate/up-split layout, x_rescale, GQA). Exact equality
    on the unquantized walk (the int8-KV walk is bounded in the dryrun:
    quantization buckets flip under f32 reduction-order differences)."""
    import dataclasses as _dc

    from inferix_tpu.models.magi.dit import init_magi_params, tiny_magi_config
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    cfg = _dc.replace(tiny_magi_config(), num_attention_heads=4,
                      num_query_groups=4, gated_linear_unit=True,
                      x_rescale_factor=0.1)
    rt = MagiRuntimeConfig(num_steps=2, window_size=2, chunk_width=2,
                           cp_strategy="cso", cfg_number=3,
                           window_dispatch="per_chunk")
    params = init_magi_params(jax.random.key(5), cfg, jnp.float32)
    cap = jnp.zeros((1, cfg.caption_max_length, cfg.caption_channels),
                    jnp.float32)
    cmask = jnp.ones((1, cfg.caption_max_length), jnp.int32)

    def run(mesh):
        pipe = MagiPipeline(cfg, rt, params=params, latent_h=8, latent_w=8,
                            max_chunks=4, dtype=jnp.float32, mesh=mesh)
        return [np.asarray(lat) for _, lat
                in pipe.generate_chunks(cap, cmask, chunk_num=2)]

    want = run(None)
    got = run(make_mesh(pcfg))
    for g, w in zip(got, want):
        # atol 1e-3 (not the usual 2e-4): x_rescale=0.1 multiplies the
        # output velocity by 10 on the way out, amplifying the tp-psum
        # f32 reduction-order noise by the same factor
        np.testing.assert_allclose(g, w, rtol=3e-4, atol=1e-3,
                                   err_msg=tag)


def test_split_gated_fc1_is_exact():
    """The gate/up-separate layout is the same math as the concatenated
    [gate|up] fc1 — bit-level on the same device."""
    import dataclasses as _dc

    from inferix_tpu.models.magi.dit import (
        init_magi_params,
        magi_forward,
        make_magi_statics,
        split_gated_fc1,
        tiny_magi_config,
    )
    from inferix_tpu.kvcache.cache import init_kv_cache

    cfg = _dc.replace(tiny_magi_config(), gated_linear_unit=True)
    params = init_magi_params(jax.random.key(0), cfg, jnp.float32)
    statics = make_magi_statics(cfg, 1, 8, 8, 4, jnp.float32)
    x = jax.random.normal(jax.random.key(1),
                          (1, cfg.chunk_width, 8, 8, cfg.in_channels),
                          jnp.float32)
    t = jnp.full((1, 1), 0.4, jnp.float32)
    caps = jax.random.normal(
        jax.random.key(2),
        (1, 1, cfg.caption_max_length, cfg.caption_channels), jnp.float32)
    cmask = jnp.ones((1, 1, cfg.caption_max_length), jnp.int32)
    kvr = jnp.asarray([[0, 1]], jnp.int32)

    def fwd(p):
        out, _ = magi_forward(p, statics, None, x, t, caps, cmask,
                              init_kv_cache(statics.spec), jnp.int32(0), kvr)
        return np.asarray(out)

    base = fwd(params)
    split = fwd(split_gated_fc1(params, cfg.ffn_hidden_size))
    # two column-split dots reduce the same K elements per output, but XLA
    # tiles them differently -> f32 reassociation at the 1e-6 level
    np.testing.assert_allclose(split, base, rtol=2e-5, atol=2e-5)
