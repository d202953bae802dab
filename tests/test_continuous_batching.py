"""Continuous batching: concurrent streams at different positions in one
batched step; admission mid-run does not disturb neighbors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.continuous import ContinuousBatcher
from inferix_tpu.pipeline.semi_ar import SemiARGenerator


@pytest.fixture(scope="module")
def batcher_factory():
    cfg = tiny_test_config()
    cfg.runtime.batch_size = 3  # 3 concurrent slots
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)

    def make():
        gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
        b = ContinuousBatcher(gen)
        m = cfg.model
        xattn = gen.encode_text_context(
            jnp.zeros((3, m.text_len, m.text_dim)))
        b.set_conditioning(xattn)
        return b

    return make


def test_streams_advance_independently(batcher_factory):
    b = batcher_factory()
    b.admit("a", num_frames=3, seed=1)
    out = b.step()
    assert [rid for rid, _ in out] == ["a"]
    # admit a second stream mid-run
    b.admit("b", num_frames=2, seed=2)
    out = b.step()
    assert sorted(rid for rid, _ in out) == ["a", "b"]
    assert b.streams["a"].frames_done == 2
    assert b.streams["b"].frames_done == 1
    out = b.step()  # a finishes (3 frames at fpb=1 -> needs 3 steps)
    out = b.step()
    assert b.streams["a"].finished and b.streams["b"].finished
    a = b.retire("a")
    assert len(a.outputs) == 3
    # a new stream can be admitted after retirement (slot pool not exhausted)
    b.admit("c", num_frames=1, seed=3)
    assert 0 <= b.streams["c"].slot < b.max_streams


def test_mid_run_admission_isolated(batcher_factory):
    """A stream admitted later produces the same latents as the same stream
    admitted first — neighbors at other positions don't leak into it."""
    b1 = batcher_factory()
    b1.admit("x", num_frames=2, seed=7)
    b1.step(); b1.step()
    solo = jnp.concatenate([o for o in b1.streams["x"].outputs], axis=1)

    b2 = batcher_factory()
    b2.admit("other", num_frames=4, seed=9)
    b2.step(); b2.step()            # other is 2 blocks in
    b2.admit("x2", num_frames=2, seed=7)
    b2.step(); b2.step()
    mixed = jnp.concatenate([o for o in b2.streams["x2"].outputs], axis=1)

    np.testing.assert_allclose(np.asarray(solo), np.asarray(mixed),
                               rtol=2e-4, atol=2e-4)


def test_mid_run_admission_isolated_with_int8_kv():
    """ADVICE round-1 finding 1, closed at the model level: continuous
    batching + int8 KV cache — every stream attends over ITS OWN prefix
    length (per-batch bounds in the quantized kernels), so a stream admitted
    next to a longer-running neighbor matches its isolated run."""
    cfg = tiny_test_config()
    cfg.runtime.batch_size = 2
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    cfg.quant.kv_cache_dtype = "int8"
    # keep weights unquantized: isolate the cache effect
    cfg.quant.exclude = ("self_attn", "cross_attn", "ffn", "text_embedding",
                        "head", "patch_embedding", "time_")
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)

    def make():
        gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
        b = ContinuousBatcher(gen)
        m = cfg.model
        xattn = gen.encode_text_context(
            jnp.zeros((2, m.text_len, m.text_dim)))
        b.set_conditioning(xattn)
        return b

    # isolated run of stream "x"
    b1 = make()
    b1.admit("x", num_frames=2, seed=7)
    for _ in range(2):
        b1.step()
    solo = np.concatenate([np.asarray(o) for o in b1.streams["x"].outputs],
                          axis=1)

    # same stream admitted while "y" is already 2 blocks in
    b2 = make()
    b2.admit("y", num_frames=4, seed=9)
    b2.step()
    b2.step()
    b2.admit("x", num_frames=2, seed=7)
    for _ in range(2):
        b2.step()
    mixed = np.concatenate([np.asarray(o) for o in b2.streams["x"].outputs],
                           axis=1)
    np.testing.assert_allclose(mixed, solo, rtol=2e-4, atol=2e-4)


def test_continuous_batching_last_step_context_mode():
    """Per-slot rng streams flow through the persist-last-KV path: streams
    still advance independently and stay slot-invariant."""
    import dataclasses

    cfg = tiny_test_config()
    cfg.runtime.batch_size = 2
    cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    b = ContinuousBatcher(gen)
    m = cfg.model
    b.set_conditioning(gen.encode_text_context(
        jnp.zeros((2, m.text_len, m.text_dim))))
    b.admit("a", num_frames=2, seed=1)
    b.step()
    b.admit("b", num_frames=1, seed=2)
    b.step()
    assert b.streams["a"].finished and b.streams["b"].finished
    outs = b.retire("a").outputs
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_mid_run_admission_isolated_ring_window_int8():
    """The full long-video serving combination: rolling-window ring cache
    (granule DUS writes at per-slot positions) + int8 KV + fast-context —
    an admitted stream still matches its isolated run exactly."""
    cfg = tiny_test_config()
    cfg.runtime.batch_size = 2
    cfg.runtime.context_mode = "last_step"
    cfg.model.local_attn_size = 2
    cfg.model.sink_size = 1
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    cfg.quant.kv_cache_dtype = "int8"
    cfg.quant.exclude = ("self_attn", "cross_attn", "ffn", "text_embedding",
                        "head", "patch_embedding", "time_")
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)

    def make():
        gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
        b = ContinuousBatcher(gen)
        m = cfg.model
        xattn = gen.encode_text_context(
            jnp.zeros((2, m.text_len, m.text_dim)))
        b.set_conditioning(xattn)
        return b

    # isolated run of "x" long enough to wrap the 3-frame (sink+2) window
    b1 = make()
    b1.admit("x", num_frames=5, seed=7)
    for _ in range(5):
        b1.step()
    solo = np.concatenate([np.asarray(o) for o in b1.streams["x"].outputs],
                          axis=1)

    # same stream admitted while "y" is already mid-flight at another slot
    b2 = make()
    b2.admit("y", num_frames=7, seed=9)
    b2.step()
    b2.step()
    b2.admit("x", num_frames=5, seed=7)
    for _ in range(5):
        b2.step()
    mixed = np.concatenate([np.asarray(o) for o in b2.streams["x"].outputs],
                           axis=1)
    np.testing.assert_allclose(mixed, solo, rtol=2e-4, atol=2e-4)
