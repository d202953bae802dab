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
