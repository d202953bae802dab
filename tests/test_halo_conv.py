"""Halo-block Pallas conv (ops/halo_conv.py) vs lax.conv oracle, plus the
VAE conv_impl="halo" routing (interpret mode on the CPU test platform).

The kernel replaces XLA's conv lowering for the VAE's stride-1 3x3(x3)
convs (reference leans on cuDNN for these — `inferix/models/wan_base/
vae.py` CausalConv3d); correctness must hold across the decode's real
shape classes: kt in {1, 3}, cin/cout in {small, 128-multiple, odd},
H not divisible by the block, W not 16-aligned.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.ops.halo_conv import halo_conv3d


def _oracle(x, w, b):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b


@pytest.mark.parametrize("tin,h,w,cin,cout,kt", [
    (6, 20, 24, 96, 96, 3),     # res-block class (cin == cout)
    (4, 13, 17, 192, 192, 3),   # H % block != 0, W not 16-aligned
    (1, 16, 24, 64, 96, 1),     # 2D conv class (upsample/head)
    (3, 7, 104, 384, 384, 3),   # 128-multiple channels -> cout blocking
    (5, 10, 12, 96, 3, 3),      # RGB head (tiny cout)
    (3, 12, 20, 96, 48, 1),     # upsample half-channel conv
])
def test_halo_conv_matches_lax(tin, h, w, cin, cout, kt):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((tin, h, w, cin)) * 0.1, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kt, 3, 3, cin, cout)) * 0.05,
                     jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    out = halo_conv3d(x, wt, b, interpret=True)
    ref = _oracle(x, wt, b)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_halo_conv_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 18, 22, 96)) * 0.1, jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, 96, 96)) * 0.05,
                     jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((96,)) * 0.1, jnp.bfloat16)
    out = halo_conv3d(x, wt, b, interpret=True)
    ref = _oracle(x, wt, b)
    assert out.dtype == jnp.bfloat16
    # f32 accumulation in the kernel vs XLA's accumulation: small tolerance
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_vae_decode_conv_impl_halo_matches_xla():
    """Whole streaming decode routed through the halo kernel equals the XLA
    conv decode (same params, same latents). A fresh CausalVAE per impl —
    the conv impl is trace-time static, so a cached jit would not see the
    switch."""
    from inferix_tpu.models.wan.vae import (CausalVAE, VAEConfig,
                                            set_vae_conv_impl)

    cfg = VAEConfig(dim=16, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temperal_downsample=(True,))
    key = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), (1, 3, 8, 12, 4),
                          jnp.float32) * 0.3

    def run():
        vae = CausalVAE(cfg, key=key)
        return vae.decode(z, chunk=2)

    try:
        ref = run()
        set_vae_conv_impl("halo", interpret_ok=True)
        out = run()
    finally:
        set_vae_conv_impl("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_vae_halo_without_interpret_ok_falls_back_to_xla_off_tpu():
    """On a non-TPU backend, conv_impl='halo' without the test opt-in must
    route to the XLA conv (running the Pallas kernel in interpret mode in
    production would be orders of magnitude slower)."""
    from inferix_tpu.models.wan import vae as vae_mod

    if jax.default_backend() == "tpu":
        pytest.skip("fallback only applies off-TPU")
    calls = []
    orig = halo_conv3d

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    x = jnp.zeros((1, 5, 20, 24, 96), jnp.float32)
    p = {"w": jnp.zeros((3, 3, 3, 96, 96), jnp.float32),
         "b": jnp.zeros((96,), jnp.float32)}
    try:
        vae_mod.set_vae_conv_impl("halo")  # no interpret_ok
        import inferix_tpu.ops.halo_conv as hc
        hc_orig = hc.halo_conv3d
        hc.halo_conv3d = spy
        out = vae_mod._conv3d(p, x)
    finally:
        hc.halo_conv3d = hc_orig
        vae_mod.set_vae_conv_impl("xla")
    assert out.shape == (1, 3, 20, 24, 96)
    assert not calls, "halo kernel must not run in interpret mode by default"


@pytest.mark.parametrize("tin,h,w,cin,cout,kt", [
    (4, 12, 20, 96, 96, 3),     # single cout block
    (3, 7, 104, 384, 384, 3),   # cout blocking (n_co > 1)
    (4, 12, 20, 192, 96, 1),    # kt=1: the upsample conv class (w8a8-only)
])
def test_halo_conv_w8a8_matches_oracle(tin, h, w, cin, cout, kt):
    """W8A8 halo conv vs the f32 oracle at quantization-appropriate
    tolerance (per-tensor act scale + per-channel weight scale => relative
    error ~1/127 of the activation/weight dynamic range)."""
    from inferix_tpu.ops.halo_conv import halo_conv3d_w8a8

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((tin, h, w, cin)) * 0.1, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kt, 3, 3, cin, cout)) * 0.05,
                     jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    out = halo_conv3d_w8a8(x, wt, b, interpret=True)
    ref = _oracle(x, wt, b)
    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() <= 0.05 * scale, (err.max(), scale)
