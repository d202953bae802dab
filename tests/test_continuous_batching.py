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
