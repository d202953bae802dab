"""Disaggregated serving: PER_BLOCK decode on dedicated decode devices.

Validates the multi-chip TRUE_STREAMING configuration (generator submesh +
decode devices) that fixes the measured single-chip gen/decode serialization
(BASELINE.md round-5). Reference analog: tile-parallel VAE distribution
(`inferix/distributed/parallelism/tile_parallel.py:27-448`); the overlap
with generation is this repo's addition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.core.types import StreamingMode
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig
from inferix_tpu.parallel.disaggregated import (
    DisaggregatedVAEDecoder,
    PixelTiles,
    _split_w,
)
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline


def _tiny_vae():
    return CausalVAE(
        VAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2), num_res_blocks=1,
                  temperal_downsample=(True, True)),
        key=jax.random.key(9),
    )


def test_pixel_tiles_pytree_and_shape():
    """PixelTiles is a registered pytree with an array-like shape, so
    jax.block_until_ready and frame-counting callbacks work unchanged."""
    spans = _split_w(16, 2, 2)
    tiles = [jnp.zeros((1, 3, 8, (w1 - w0) * 8, 3)) for w0, w1, _, _ in spans]
    pt = PixelTiles(tiles, spans, 8)
    assert pt.shape == (1, 3, 8, 128, 3)
    out = jax.block_until_ready(pt)
    assert isinstance(out, PixelTiles)
    doubled = jax.tree.map(lambda t: t + 1.0, pt)
    assert isinstance(doubled, PixelTiles)
    assert float(doubled.tiles[0].max()) == 1.0


def test_split_w_geometry():
    spans = _split_w(16, 4, 2)
    assert spans[0] == (0, 6, 0, 4)
    assert spans[-1] == (10, 16, 2, 6)
    # owned regions tile the width exactly once
    owned = [(w0 + k0, w0 + k1) for w0, _, k0, k1 in spans]
    assert owned[0][0] == 0 and owned[-1][1] == 16
    for (_, a1), (b0, _) in zip(owned, owned[1:]):
        assert a1 == b0
    assert _split_w(16, 1, 2) == [(0, 16, 0, 16)]


def test_single_tile_matches_vae_decode():
    """tiles=1 on a non-default device reproduces the local decode path."""
    vae = _tiny_vae()
    z = jax.random.normal(jax.random.key(0), (1, 3, 8, 16, 16), jnp.float32)
    dec = DisaggregatedVAEDecoder(vae, [jax.devices()[4]], tiles=1)
    px, cache = dec.decode_chunk(z, None, first=True)
    assert isinstance(px, PixelTiles)
    assert px.tiles[0].devices() == {jax.devices()[4]}
    want, _ = vae.decode_chunk(z, None, first=True)
    want = np.asarray(jnp.clip(want, -1, 1) * 0.5 + 0.5)
    np.testing.assert_allclose(px.assemble(), want, atol=1e-5, rtol=1e-5)
    # cache carry: second block matches too
    z2 = jax.random.normal(jax.random.key(1), z.shape, jnp.float32)
    px2, _ = dec.decode_chunk(z2, cache, first=False)
    want_c = vae.decode_chunk(z, None, first=True)[1]
    want2, _ = vae.decode_chunk(z2, want_c, first=False)
    want2 = np.asarray(jnp.clip(want2, -1, 1) * 0.5 + 0.5)
    np.testing.assert_allclose(px2.assemble(), want2, atol=1e-5, rtol=1e-5)


def test_tiled_decode_device_placement_and_equivalence():
    """4 tiles over 4 decode devices: (a) each tile executes on its own
    device, (b) the assembled pixels equal the SAME tiling computed on the
    default device (tiling semantics are device-count independent), and
    (c) seams stay close to the untiled decode (halo + linear blend)."""
    vae = _tiny_vae()
    z = jax.random.normal(jax.random.key(2), (1, 3, 8, 16, 16), jnp.float32)
    devs = jax.devices()[4:8]
    dec = DisaggregatedVAEDecoder(vae, devs, tiles=4, overlap=2)
    px, cache = dec.decode_chunk(z, None, first=True)
    assert [t.devices() for t in px.tiles] == [{d} for d in devs]

    ref = DisaggregatedVAEDecoder(vae, [jax.devices()[0]], tiles=4, overlap=2)
    px_ref, _ = ref.decode_chunk(z, None, first=True)
    np.testing.assert_allclose(px.assemble(), px_ref.assemble(),
                               atol=1e-5, rtol=1e-5)

    full, _ = vae.decode_chunk(z, None, first=True)
    full = np.asarray(jnp.clip(full, -1, 1) * 0.5 + 0.5)
    tiled = px.assemble()
    assert tiled.shape == full.shape
    # seam sanity: halo + blend keep the tiled decode near the untiled one
    # even at this adversarial geometry (random-init weights, 4-column owned
    # tiles whose receptive field spans the whole tile); production tiles are
    # tens of columns wide with the same 2-column halo
    assert float(np.abs(tiled - full).mean()) < 0.05

    # streaming: tiled cache carry == tiled decode of the concatenated clip
    z2 = jax.random.normal(jax.random.key(3), z.shape, jnp.float32)
    px2, _ = dec.decode_chunk(z2, cache, first=False)
    both = DisaggregatedVAEDecoder(vae, devs, tiles=4, overlap=2)
    pxa, ca = both.decode_chunk(z, None, first=True)
    pxb, _ = both.decode_chunk(z2, ca, first=False)
    np.testing.assert_allclose(px2.assemble(), pxb.assemble(),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_disaggregated_stream_matches_local():
    """End-to-end: the TRUE_STREAMING pipeline with decode routed to a
    dedicated device streams the same pixels as the local interleaved
    path."""
    def build():
        cfg = tiny_test_config()
        cfg.runtime.num_frames = 4
        cfg.runtime.frames_per_segment = 4
        cfg.runtime.streaming_mode = StreamingMode.TRUE_STREAMING
        params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
        p = SelfForcingPipeline(cfg, params=params, vae=_tiny_vae(),
                                dtype=jnp.float32)
        p.setup()
        return p

    local = build()
    want = []
    local.run_streaming_generation(
        ["p"], num_segments=1,
        stream_callback=lambda px: want.append(np.asarray(px)))

    dis = build()
    dis.set_disaggregated_decode([jax.devices()[4]], tiles=1)
    got = []
    dis.run_streaming_generation(
        ["p"], num_segments=1,
        stream_callback=lambda px: got.append(px.assemble()))

    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5, rtol=1e-5)
