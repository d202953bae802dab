"""Causal VAE: geometry, temporal causality, and streaming-cache continuity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig


@pytest.fixture(scope="module")
def vae():
    cfg = VAEConfig(dim=16, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                    temperal_downsample=(True, True))
    return CausalVAE(cfg, key=jax.random.key(0))


def test_encode_decode_geometry(vae):
    b, t, h, w = 1, 9, 32, 32  # t = 1 + 4k
    video = jax.random.normal(jax.random.key(1), (b, t, h, w, 3)) * 0.1
    # latent normalization tables are 16-channel; small test uses z_dim=4
    lat = vae.encode(video)
    sf = vae.cfg.spatial_factor
    assert lat.shape == (b, 1 + (t - 1) // 4, h // sf, w // sf, vae.cfg.z_dim)
    out = vae.decode(lat)
    assert out.shape == (b, t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_temporal_causality(vae):
    """Changing a later latent frame must not change earlier pixel frames."""
    b, tl, h, w = 1, 3, 8, 8
    z1 = jax.random.normal(jax.random.key(2), (b, tl, h, w, vae.cfg.z_dim))
    z2 = z1.at[:, 2].multiply(-1.0)
    o1 = np.asarray(vae.decode(z1))
    o2 = np.asarray(vae.decode(z2))
    # frames produced by latent frames 0..1 (first 1 + 4 = 5 pixel frames)
    np.testing.assert_array_equal(o1[:, :5], o2[:, :5])
    assert np.abs(o1[:, 5:] - o2[:, 5:]).max() > 0


def test_decode_streaming_continuity(vae):
    """Chunked decode with carried cache == the full decode loop."""
    b, tl, h, w = 1, 3, 8, 8
    z = jax.random.normal(jax.random.key(3), (b, tl, h, w, vae.cfg.z_dim))
    full = np.asarray(vae.decode(z))

    outs, cache = [], None
    for i in range(tl):
        o, cache = vae.decode_chunk(z[:, i:i + 1], cache, first=(i == 0))
        outs.append(np.asarray(o))
    streamed = np.concatenate(outs, axis=1)
    # decode() now runs multi-frame chunks; per-frame vs chunked conv
    # fusions reassociate at ~1e-7 (f32)
    np.testing.assert_allclose(np.clip(streamed, -1, 1), full, atol=1e-5)


def test_encode_uses_temporal_context(vae):
    """Later chunks see earlier frames through the conv caches."""
    b, t, h, w = 1, 9, 16, 16
    v1 = jax.random.normal(jax.random.key(4), (b, t, h, w, 3)) * 0.1
    v2 = v1.at[:, 0].multiply(-1.0)  # change only the first frame
    l1 = np.asarray(vae.encode(v1))
    l2 = np.asarray(vae.encode(v2))
    # second latent frame depends on frame 0 via causal convs
    assert np.abs(l1[:, 1] - l2[:, 1]).max() > 0


def test_causal_conv_chunked_matches_torch_full_sequence():
    """The streaming conv-cache mechanism vs ground truth: chunked causal
    conv with carried state must equal a torch Conv3d over the full sequence
    with causal (left) zero padding — the reference CausalConv3d semantics
    (`wan_base/vae.py:16-36`)."""
    import torch

    from inferix_tpu.models.wan.vae import _CacheCtx, causal_conv3d

    rng = np.random.default_rng(0)
    cin, cout, t, h, w = 3, 5, 9, 6, 6
    wgt = rng.standard_normal((2, 3, 3, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((1, t, h, w, cin)).astype(np.float32)

    # torch ground truth: causal pad (kt-1)=1 front, spatial same
    conv = torch.nn.Conv3d(cin, cout, (2, 3, 3), padding=(0, 1, 1))
    conv.weight.data = torch.from_numpy(wgt.transpose(4, 3, 0, 1, 2).copy())
    conv.bias.data = torch.from_numpy(bias)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3).copy())
    xt = torch.nn.functional.pad(xt, (0, 0, 0, 0, 1, 0))  # temporal causal
    want = conv(xt).detach().numpy().transpose(0, 2, 3, 4, 1)

    p = {"w": jnp.asarray(wgt), "b": jnp.asarray(bias)}
    # chunked: [2, 3, 4] frames with carried cache
    outs = []
    cache = None
    pos = 0
    for n in (2, 3, 4):
        ctx = _CacheCtx(cache, first=(pos == 0))
        y = causal_conv3d(p, jnp.asarray(x[:, pos:pos + n]), ctx)
        cache = ctx.cache
        outs.append(np.asarray(y))
        pos += n
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_block_decode_matches_per_frame_streaming():
    """T=3 block decode (what generators hand the VAE) is bit-equal to the
    per-frame stream — including the FIRST block, where frame 0 is the 'Rep'
    passthrough and frames 1-2 run the temporal conv seeded with the
    per-frame path's zeros."""
    import jax
    import jax.numpy as jnp

    from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig

    cfg = VAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2), num_res_blocks=1,
                    temperal_downsample=(True, True))
    vae = CausalVAE(cfg, key=jax.random.key(3))
    z = jax.random.normal(jax.random.key(1), (1, 6, 8, 8, 16))

    outs, cache = [], None
    for i in range(6):
        o, cache = vae.decode_chunk(z[:, i:i + 1], cache, first=(i == 0))
        outs.append(o)
    ref = jnp.concatenate(outs, axis=1)

    outs, cache = [], None
    for i in range(0, 6, 3):
        o, cache = vae.decode_chunk(z[:, i:i + 3], cache, first=(i == 0))
        outs.append(o)
    blk = jnp.concatenate(outs, axis=1)

    assert blk.shape == ref.shape == (1, 21, 32, 32, 3)
    assert float(jnp.abs(ref - blk).max()) < 1e-5
    assert float(jnp.abs(vae.decode(z) - jnp.clip(ref, -1, 1)).max()) < 1e-5


def test_shifted_matmul_conv_impl_matches_xla():
    """The MXU shifted-matmul conv formulation (set_vae_conv_impl) equals
    the XLA conv through a full streaming decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inferix_tpu.models.wan.vae import (CausalVAE, VAEConfig,
                                            set_vae_conv_impl)

    cfg = VAEConfig(dim=16, z_dim=8, dim_mult=(1, 2), num_res_blocks=1,
                    temperal_downsample=(True,))
    vae = CausalVAE(cfg, key=jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 3, 8, 8, cfg.z_dim))
    ref = np.asarray(vae.decode(z))
    # the conv impl is a TRACE-time switch: it must be set before the VAE
    # builds its jitted decode (reusing `vae` here would hit the jit cache
    # and compare the XLA result to itself)
    try:
        set_vae_conv_impl("shifted_matmul")
        vae2 = CausalVAE(cfg, params=vae.params)
        got = np.asarray(vae2.decode(z))
    finally:
        set_vae_conv_impl("xla")
    assert np.isfinite(got).all()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_upsample_phase_conv_matches_repeat_conv():
    """_upsample2x_conv3x3 (4 phase-wise 2x2 convs at low res) must equal
    the reference formulation conv3x3(nearest_repeat_2x(x)) exactly —
    the phase kernels are pairwise sums of the 3x3 weights and the border
    zero-pads line up; any drift here is an implementation bug, not fp
    noise (tolerance is ulp-level)."""
    from inferix_tpu.models.wan.vae import _upsample2x_conv3x3

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 3, 7, 11, 16)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((1, 3, 3, 16, 8)) * 0.1,
                          jnp.float32),
         "b": jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)}
    ref_in = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    ref = jax.lax.conv_general_dilated(
        ref_in, p["w"], (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["b"]
    got = _upsample2x_conv3x3(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
