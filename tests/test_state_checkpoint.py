"""Mid-generation save/resume: a resumed stream continues bit-for-bit."""
import jax
import jax.numpy as jnp
import numpy as np

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.kvcache.cache import KVCache
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.semi_ar import SemiARGenerator
from inferix_tpu.utils.state_checkpoint import (
    load_generation_state,
    save_generation_state,
)


def test_roundtrip_types(tmp_path):
    path = str(tmp_path / "state.npz")
    save_generation_state(
        path,
        cache={"k": jnp.ones((2, 3), jnp.bfloat16), "scale": None},
        rng=jax.random.key(7),
        frames_done=5,
        latents=jnp.zeros((1, 2, 4), jnp.float32),
    )
    state = load_generation_state(path)
    assert state["cache"]["k"].dtype == jnp.bfloat16
    assert state["cache"]["scale"] is None
    assert state["frames_done"] == 5
    # rng key round-trips to identical randomness
    a = np.asarray(jax.random.normal(state["rng"], (4,)))
    b = np.asarray(jax.random.normal(jax.random.key(7), (4,)))
    np.testing.assert_array_equal(a, b)


def test_resume_continues_bitwise(tmp_path):
    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    xattn = gen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    r = cfg.runtime
    noise = jax.random.normal(
        jax.random.key(1), (1, 4, r.latent_height, r.latent_width,
                            r.latent_channels), jnp.float32)

    # uninterrupted run
    full, _ = gen.generate(noise, xattn, jax.random.key(2))

    # run 2 blocks, snapshot, "restart", resume 2 more
    cache = gen.init_cache()
    rng = jax.random.key(2)
    outs = []
    for bi in range(2):
        rng, sub = jax.random.split(rng)
        x0, cache = gen.denoise_block(cache, xattn, noise[:, bi:bi + 1], sub, bi)
        outs.append(x0)
    path = save_generation_state(
        str(tmp_path / "mid.npz"), cache=cache, rng=rng, frames_done=2,
    )

    state = load_generation_state(path)
    cache2 = KVCache(k=state["cache"]["k"], v=state["cache"]["v"],
                     k_scale=state["cache"]["k_scale"],
                     v_scale=state["cache"]["v_scale"])
    rng2 = state["rng"]
    frames = state["frames_done"]
    for bi in range(frames, 4):
        rng2, sub = jax.random.split(rng2)
        x0, cache2 = gen.denoise_block(cache2, xattn, noise[:, bi:bi + 1],
                                       sub, bi)
        outs.append(x0)
    resumed = jnp.concatenate(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))


def test_state_checkpoint_fp8_cache_roundtrip(tmp_path):
    """fp8 e4m3 KV caches round-trip bit-exactly through the state file."""
    import jax

    from inferix_tpu.utils.state_checkpoint import (
        load_generation_state, save_generation_state)

    vals = jnp.asarray([0.5, -1.25, 448.0, 0.001, -0.0], jnp.float32)
    cache_k = jnp.tile(vals, (4, 5)).astype(jnp.float8_e4m3fn)
    path = save_generation_state(str(tmp_path / "s.npz"), cache_k=cache_k,
                                 frames_done=3)
    st = load_generation_state(path)
    assert st["cache_k"].dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(
        np.asarray(st["cache_k"].astype(jnp.float32)),
        np.asarray(cache_k.astype(jnp.float32)))
    assert st["frames_done"] == 3


def test_magi_walk_checkpoint_resume_bit_exact(tmp_path):
    """MAGI persistent world state: snapshot the walk mid-way (through the
    npz round-trip of utils/state_checkpoint), resume in a FRESH pipeline,
    and the remaining chunks match the uninterrupted walk exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inferix_tpu.models.magi.dit import init_magi_params, tiny_magi_config
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig
    from inferix_tpu.utils.state_checkpoint import (
        load_generation_state,
        save_generation_state,
    )

    mcfg = tiny_magi_config()
    rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2)
    params = init_magi_params(jax.random.key(3), mcfg, jnp.float32)
    cap = jnp.ones((1, mcfg.caption_max_length, mcfg.caption_channels),
                   jnp.float32) * 0.1
    cmask = jnp.ones((1, mcfg.caption_max_length), jnp.int32)

    def new_pipe():
        return MagiPipeline(mcfg, rt, params=params, latent_h=8, latent_w=8,
                            max_chunks=6, dtype=jnp.float32)

    # uninterrupted reference walk
    ref = [(i, np.asarray(lat)) for i, lat in
           new_pipe().generate_chunks(cap, cmask, chunk_num=3)]

    # interrupted walk: snapshot at every step, stop after the 3rd forward
    path = str(tmp_path / "walk.npz")
    seen = []
    gen = new_pipe().generate_chunks(
        cap, cmask, chunk_num=3,
        state_callback=lambda st, step: save_generation_state(path, **st))
    it = iter(gen)
    # drive exactly 3 forwards by stepping the generator via a side effect:
    # pull yielded chunks while a step counter (in the saved state) < 3
    while True:
        st = load_generation_state(path) if (tmp_path / "walk.npz").exists() \
            else {"step": 0}
        if int(st.get("step", 0)) >= 3:
            break
        try:
            seen.append(next(it))
        except StopIteration:
            break
    del gen, it

    st = load_generation_state(path)
    assert int(st["step"]) == 3 or seen  # snapshot landed

    resumed = [(i, np.asarray(lat)) for i, lat in
               new_pipe().generate_chunks(cap, cmask, chunk_num=3,
                                          resume_state=st)]
    got = {i: lat for i, lat in seen}
    for i, lat in resumed:
        got[i] = np.asarray(lat)
    assert sorted(got) == [i for i, _ in ref]
    for i, want in ref:
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"chunk {i}")
