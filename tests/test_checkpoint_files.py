"""On-disk checkpoint formats -> loader -> model, end to end.

The converters are oracle-parity-tested elsewhere on in-memory state dicts;
these tests exercise the actual FILE paths the reference ships:
  * Self-Forcing/CausVid: a single .pt with the weights nested under
    `generator_ema` (`inferix/pipeline/self_forcing/pipeline.py:87-125`,
    torch.load mmap), loaded from a checkpoint DIRECTORY.
  * MAGI: a sharded-safetensors directory loaded with a thread pool
    (`inferix/core/checkpoint/inference_loading.py:30-170`).
  * Wan VAE: a bare .pth state dict (`Wan2.1_VAE.pth`).
Weights are random but laid out with the reference's exact key names and
tensor shapes, so the full path disk -> load -> convert -> generate runs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.utils.checkpoint import (
    convert_causal_wan_state_dict,
    convert_magi_state_dict,
    convert_wan_vae_state_dict,
    load_self_forcing_checkpoint,
    load_sharded_safetensors,
    load_wan_vae,
)

from test_checkpoint_and_text import _torch_causal_wan_sd
from test_magi_torch_parity import make_reference_sd


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, "treedefs differ"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_self_forcing_pt_file_to_generation(tmp_path):
    """torch.save'd generator_ema .pt in a directory -> generation."""
    cfg = tiny_test_config()
    sd = _torch_causal_wan_sd(cfg.model)
    torch.save({"generator_ema": sd}, tmp_path / "self_forcing_dmd.pt")

    params = load_self_forcing_checkpoint(str(tmp_path), cfg.model,
                                          dtype=jnp.float32)
    # file path produces the same tree as the in-memory converter
    _tree_equal(params, convert_causal_wan_state_dict(
        sd, cfg.model, dtype=jnp.float32))

    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    gen = SemiARGenerator(cfg, params, dtype=jnp.float32)
    r = cfg.runtime
    noise = jax.random.normal(
        jax.random.key(1),
        (r.batch_size, 2 * cfg.model.num_frame_per_block, r.latent_height,
         r.latent_width, r.latent_channels), dtype=jnp.float32)
    xattn = gen.encode_text_context(
        jnp.zeros((1, cfg.model.text_len, cfg.model.text_dim)))
    latents, _ = gen.generate(noise, xattn, jax.random.key(2))
    assert latents.shape == noise.shape
    assert np.isfinite(np.asarray(latents)).all()


def test_magi_sharded_safetensors_directory(tmp_path):
    """Sharded .safetensors directory -> threaded load -> MAGI params."""
    from safetensors.numpy import save_file

    from inferix_tpu.models.magi.dit import tiny_magi_config

    cfg = dataclasses.replace(tiny_magi_config(), num_layers=3)
    sd = make_reference_sd(cfg)  # torch tensors, reference key names
    np_sd = {k: v.numpy() for k, v in sd.items()}

    keys = sorted(np_sd)
    half = len(keys) // 2
    save_file({k: np_sd[k] for k in keys[:half]},
              tmp_path / "model-00001-of-00002.safetensors")
    save_file({k: np_sd[k] for k in keys[half:]},
              tmp_path / "model-00002-of-00002.safetensors")

    loaded = load_sharded_safetensors(str(tmp_path))
    assert sorted(loaded) == keys

    params_file = convert_magi_state_dict(loaded, cfg, dtype=jnp.float32)
    params_mem = convert_magi_state_dict(sd, cfg, dtype=jnp.float32)
    _tree_equal(params_file, params_mem)


@pytest.fixture(scope="module")
def vae_cfg():
    from inferix_tpu.models.wan.vae import VAEConfig

    return VAEConfig(dim=16, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                     temperal_downsample=(True,))


def _torch_vae_sd(cfg, seed=3):
    """Random weights with the reference WanVAE_ module naming/shapes
    (`inferix/models/wan_base/vae.py:477-512`)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv3(name, cin, cout, kt=3, kh=3, kw=3):
        sd[f"{name}.weight"] = torch.randn(
            cout, cin, kt, kh, kw, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * 0.01

    def conv2(name, cin, cout, k=3):
        sd[f"{name}.weight"] = torch.randn(
            cout, cin, k, k, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * 0.01

    def gamma(name, c):
        # reference RMS_norm stores gamma as [C,1,1]
        sd[f"{name}.gamma"] = torch.randn(c, 1, 1, generator=g) * 0.1 + 1.0

    def res(prefix, cin, cout):
        gamma(f"{prefix}.residual.0", cin)
        conv3(f"{prefix}.residual.2", cin, cout)
        gamma(f"{prefix}.residual.3", cout)
        conv3(f"{prefix}.residual.6", cout, cout)
        if cin != cout:
            conv3(f"{prefix}.shortcut", cin, cout, 1, 1, 1)

    def attn(prefix, c):
        gamma(f"{prefix}.norm", c)
        conv2(f"{prefix}.to_qkv", c, 3 * c, 1)
        conv2(f"{prefix}.proj", c, c, 1)

    # encoder
    dims = [cfg.dim * u for u in (1, *cfg.dim_mult)]
    conv3("encoder.conv1", 3, dims[0])
    idx = 0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{idx}", cin, cout)
            idx += 1
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            conv2(f"encoder.downsamples.{idx}.resample.1", cout, cout)
            if cfg.temperal_downsample[i]:
                conv3(f"encoder.downsamples.{idx}.time_conv",
                      cout, cout, 3, 1, 1)
            idx += 1
    res("encoder.middle.0", dims[-1], dims[-1])
    attn("encoder.middle.1", dims[-1])
    res("encoder.middle.2", dims[-1], dims[-1])
    gamma("encoder.head.0", dims[-1])
    conv3("encoder.head.2", dims[-1], cfg.z_dim * 2)

    # decoder
    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1], *reversed(cfg.dim_mult))]
    conv3("decoder.conv1", cfg.z_dim, ddims[0])
    res("decoder.middle.0", ddims[0], ddims[0])
    attn("decoder.middle.1", ddims[0])
    res("decoder.middle.2", ddims[0], ddims[0])
    idx = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2
        for _ in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{idx}", cin, cout)
            idx += 1
            cin = cout
        if i != len(cfg.dim_mult) - 1:
            conv2(f"decoder.upsamples.{idx}.resample.1", cout, cout // 2)
            if cfg.temperal_upsample[i]:
                conv3(f"decoder.upsamples.{idx}.time_conv",
                      cout, cout * 2, 3, 1, 1)
            idx += 1
    gamma("decoder.head.0", cfg.dim)
    conv3("decoder.head.2", cfg.dim, 3)

    conv3("conv1", cfg.z_dim * 2, cfg.z_dim * 2, 1, 1, 1)
    conv3("conv2", cfg.z_dim, cfg.z_dim, 1, 1, 1)
    return sd


def test_wan_vae_pth_file_to_decode(tmp_path, vae_cfg):
    """Bare .pth VAE state dict -> load_wan_vae -> chunked decode."""
    from inferix_tpu.models.wan.vae import CausalVAE

    sd = _torch_vae_sd(vae_cfg)
    torch.save(sd, tmp_path / "Wan2.1_VAE.pth")

    vae = load_wan_vae(str(tmp_path / "Wan2.1_VAE.pth"), vae_cfg)

    # converted tree has the same structure/shapes as a fresh init
    ref = CausalVAE(vae_cfg, key=jax.random.key(0))
    la, ta = jax.tree_util.tree_flatten(vae.params)
    lb, tb = jax.tree_util.tree_flatten(ref.params)
    assert ta == tb, "converted VAE tree differs from init structure"
    for x, y in zip(la, lb):
        assert x.shape == y.shape, (x.shape, y.shape)

    latents = jax.random.normal(jax.random.key(5), (1, 2, 4, 4, vae_cfg.z_dim))
    frames = vae.decode(latents)
    # temporal factor 2, first latent frame maps to 1 pixel frame
    assert frames.shape[1] == 1 + (latents.shape[1] - 1) * 2
    assert frames.shape[2:] == (4 * vae_cfg.spatial_factor,
                                4 * vae_cfg.spatial_factor, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_vae_converter_rejects_missing_keys(vae_cfg):
    sd = _torch_vae_sd(vae_cfg)
    del sd["decoder.head.2.weight"]
    with pytest.raises(KeyError):
        convert_wan_vae_state_dict(sd, vae_cfg)
