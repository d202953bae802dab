"""MAGI ViT-VAE geometry + tile processor blending."""
import jax
import jax.numpy as jnp
import numpy as np

from inferix_tpu.models.magi.vae import ViTVAE, tiny_vitvae_config
from inferix_tpu.parallel.tile_parallel import TileProcessor, split_tiles


def test_vitvae_roundtrip_shapes():
    vae = ViTVAE(tiny_vitvae_config(), key=jax.random.key(0))
    video = jax.random.normal(jax.random.key(1), (1, 4, 16, 16, 3)) * 0.1
    z = vae.encode(video)
    assert z.shape == (1, 2, 4, 4, vae.cfg.z_chans)
    out = vae.decode(z)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()


def test_vitvae_single_frame():
    vae = ViTVAE(tiny_vitvae_config(), key=jax.random.key(0))
    img = jax.random.normal(jax.random.key(2), (1, 1, 16, 16, 3)) * 0.1
    z = vae.encode(img)
    assert z.shape[1] == 1


def test_split_tiles_cover():
    tiles = split_tiles(t=8, h=33, w=17, tile_t=8, tile_h=16, tile_w=16,
                        overlap_h=4, overlap_w=4)
    cover = np.zeros((8, 33, 17), bool)
    for tl in tiles:
        cover[tl.t0:tl.t1, tl.h0:tl.h1, tl.w0:tl.w1] = True
    assert cover.all()


def test_tile_processor_identity_blend():
    """Identity fn through overlapping tiles reproduces the input exactly
    (blend of identical values is identity)."""
    x = jnp.asarray(np.random.default_rng(0).random((1, 4, 24, 24, 3)),
                    jnp.float32)
    tp = TileProcessor(fn=lambda c: c, scale_t=1, scale_hw=1)
    out = tp.process(x, tile_t=4, tile_h=16, tile_w=16,
                     overlap_h=8, overlap_w=8)
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-6)


def test_tile_processor_upscale():
    x = jnp.ones((1, 2, 8, 8, 3), jnp.float32)
    tp = TileProcessor(fn=lambda c: jnp.repeat(jnp.repeat(c, 2, 2), 2, 3),
                       scale_t=1, scale_hw=2)
    out = tp.process(x, tile_t=2, tile_h=4, tile_w=4, overlap_h=2,
                     overlap_w=2)
    assert out.shape == (1, 2, 16, 16, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
