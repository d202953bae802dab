"""MAGI ViT-VAE vs a torch-CPU oracle of the reference layer graph.

The oracle re-derives, from the reference equations
(`inferix/models/magi/vae/vae_module.py`), the exact computation: Conv3d
patch embedding, cls token, LEARNABLE pos embeds with trilinear resize,
ManualLayerNorm-in-attn over packed qkv, 3D interleaved rotary (freq_bands
step=1, uncentered temporal axis, eva ref-shape rescale), plain pre-norm
variant, decoder final_proj + LayerNorm + unpatchify + 3x3x3 Conv3d. The
JAX model consumes a converted reference-format state dict, so this also
validates `convert_magi_vae_state_dict` end-to-end (VERDICT round-2
missing #3: real MAGI VAE checkpoints must load)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from inferix_tpu.models.magi.vae import ViTVAE, ViTVAEConfig
from inferix_tpu.utils.checkpoint import (
    convert_magi_vae_state_dict,
    vitvae_config_from_ddconfig,
)

torch.manual_seed(0)


def oracle_rope(feat_shape, head_dim, ref_feat_shape=(4, 16, 16),
                temperature=10000.0):
    """build_rotary_pos_embed in_pixels=False (vae_module.py:55-201)."""
    nb = head_dim // 6
    exp = torch.arange(0, nb, 1).float() / nb
    bands = 1.0 / (temperature ** exp)
    t = []
    for i, s in enumerate(feat_shape):
        x = torch.arange(s).float()
        if i != 0:
            x = x - (s - 1) / 2
        t.append(x / s * ref_feat_shape[i])
    grid = torch.stack(torch.meshgrid(*t, indexing="ij"), dim=-1)
    pos = grid.unsqueeze(-1) * bands
    sin = pos.sin().reshape(-1, 3 * nb).repeat_interleave(2, -1)
    cos = pos.cos().reshape(-1, 3 * nb).repeat_interleave(2, -1)
    return sin, cos


def oracle_rot(x):
    return torch.stack([-x[..., 1::2], x[..., ::2]], -1).reshape(x.shape)


def oracle_manual_ln(x, eps=1e-5):
    mean = x.mean(dim=-1, keepdim=True)
    std = x.std(dim=-1, keepdim=True, unbiased=False)
    return (x - mean) / (std + eps)


def oracle_resize_pos(posemb, src, dst):
    p = posemb.reshape(1, *src, -1).permute(0, 4, 1, 2, 3)
    p = F.interpolate(p, size=dst, mode="trilinear", align_corners=False)
    return p.permute(0, 2, 3, 4, 1).reshape(dst[0] * dst[1] * dst[2], -1)


class VAEOracle:
    def __init__(self, sd, cfg: ViTVAEConfig):
        self.sd, self.cfg = sd, cfg

    def _lin(self, name, x):
        w = self.sd[f"{name}.weight"].float()
        out = x.float() @ w.t()
        if f"{name}.bias" in self.sd:
            out = out + self.sd[f"{name}.bias"].float()
        return out

    def _ln(self, name, x, eps=1e-5):
        return F.layer_norm(x.float(), (x.shape[-1],),
                            self.sd[f"{name}.weight"].float(),
                            self.sd[f"{name}.bias"].float(), eps)

    def _tower(self, side, x, feat_shape):
        cfg, sd = self.cfg, self.sd
        b = x.shape[0]
        if cfg.with_cls_token:
            cls = sd[f"{side}.cls_token"].float().expand(b, -1, -1)
            x = torch.cat([cls, x], dim=1)
        pos = sd[f"{side}.pos_embed"].float()[0]
        src = (cfg.latent_length, cfg.latent_size, cfg.latent_size)
        ncls = cfg.cls_token_nums
        if tuple(feat_shape) != src:
            grid = oracle_resize_pos(pos[ncls:], src, feat_shape)
            pos = torch.cat([pos[:ncls], grid], dim=0)
        x = x + pos[None]

        sin, cos = oracle_rope(feat_shape, cfg.head_dim,
                               cfg.rope_ref_feat_shape)
        nh, hd = cfg.num_heads, cfg.head_dim
        for i in range(cfg.depth):
            pre = f"{side}.blocks.{i}"
            h = x if cfg.ln_in_attn else self._ln(f"{pre}.norm1", x)
            qkv = self._lin(f"{pre}.attn.qkv", h).reshape(
                b, -1, 3, nh, hd)
            if cfg.ln_in_attn:
                qkv = oracle_manual_ln(qkv)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if cfg.use_rope:
                s_ = sin[None, :, None, :]
                c_ = cos[None, :, None, :]
                q = torch.cat([q[:, :ncls],
                               q[:, ncls:] * c_ + oracle_rot(q[:, ncls:]) * s_],
                              dim=1)
                k = torch.cat([k[:, :ncls],
                               k[:, ncls:] * c_ + oracle_rot(k[:, ncls:]) * s_],
                              dim=1)
            logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            p = torch.softmax(logits, dim=-1)
            o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(
                b, -1, cfg.embed_dim)
            x = x + self._lin(f"{pre}.attn.proj", o)
            h = self._ln(f"{pre}.norm2", x)
            x = x + self._lin(
                f"{pre}.mlp.fc2",
                F.gelu(self._lin(f"{pre}.mlp.fc1", h)))
        x = self._ln(f"{side}.norm", x)
        return x[:, ncls:]

    def encode_moments(self, video):
        """video [B, T, H, W, C] channels-last -> [B, gt, gh, gw, 2z]."""
        cfg = self.cfg
        x = video.permute(0, 4, 1, 2, 3).float()      # NCTHW
        w = self.sd["encoder.patch_embed.proj.weight"].float()
        bconv = self.sd["encoder.patch_embed.proj.bias"].float()
        x = F.conv3d(x, w, bconv,
                     stride=(cfg.patch_length, cfg.patch_size,
                             cfg.patch_size))
        feat = (x.shape[2], x.shape[3], x.shape[4])
        x = x.flatten(2).transpose(1, 2)
        x = self._tower("encoder", x, feat)
        out = self._lin("encoder.last_layer", x)
        return out.reshape(x.shape[0], *feat, -1)

    def decode(self, z):
        """z [B, gt, gh, gw, zc] -> pixels [B, T, H, W, 3] channels-last."""
        cfg = self.cfg
        b, gt, gh, gw, zc = z.shape
        x = self._lin("decoder.proj_in", z.reshape(b, -1, zc).float())
        x = self._tower("decoder", x, (gt, gh, gw))
        if cfg.use_final_proj:
            x = self._lin("decoder.final_proj", x)
            x = self._ln("decoder.final_norm", x)
        pl, ps, uc = cfg.patch_length, cfg.patch_size, cfg.unpatch_channels
        x = x.reshape(b, gt, gh, gw, pl, ps, ps, uc)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, uc, gt * pl, gh * ps, gw * ps)
        x = F.conv3d(x, self.sd["decoder.last_layer.weight"].float(),
                     self.sd["decoder.last_layer.bias"].float(), padding=1)
        return x.permute(0, 2, 3, 4, 1)


def make_vae_sd(cfg: ViTVAEConfig):
    g = torch.Generator().manual_seed(5)
    d = cfg.embed_dim
    sd = {}

    def lin(name, i, o, bias=True, scale=0.05):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * scale
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    def ln(name, n):
        sd[f"{name}.weight"] = 1 + torch.randn(n, generator=g) * 0.02
        sd[f"{name}.bias"] = torch.randn(n, generator=g) * 0.02

    n_tok = cfg.num_patches + cfg.cls_token_nums
    for side in ("encoder", "decoder"):
        sd[f"{side}.pos_embed"] = torch.randn(1, n_tok, d, generator=g) * 0.02
        if cfg.with_cls_token:
            sd[f"{side}.cls_token"] = torch.randn(1, 1, d, generator=g) * 0.02
        for i in range(cfg.depth):
            pre = f"{side}.blocks.{i}"
            lin(f"{pre}.attn.qkv", d, 3 * d, bias=cfg.qkv_bias)
            lin(f"{pre}.attn.proj", d, d)
            if not cfg.ln_in_attn:
                ln(f"{pre}.norm1", d)
            ln(f"{pre}.norm2", d)
            lin(f"{pre}.mlp.fc1", d, int(d * cfg.mlp_ratio))
            lin(f"{pre}.mlp.fc2", int(d * cfg.mlp_ratio), d)
        ln(f"{side}.norm", d)
    sd["encoder.patch_embed.proj.weight"] = torch.randn(
        d, cfg.in_chans, cfg.patch_length, cfg.patch_size, cfg.patch_size,
        generator=g) * 0.05
    sd["encoder.patch_embed.proj.bias"] = torch.randn(d, generator=g) * 0.02
    sd["encoder.last_layer.weight"] = torch.randn(
        cfg.z_chans * (2 if cfg.double_z else 1), d, generator=g) * 0.05
    sd["encoder.last_layer.bias"] = torch.randn(
        cfg.z_chans * (2 if cfg.double_z else 1), generator=g) * 0.02
    lin("decoder.proj_in", cfg.z_chans, d)
    vol = cfg.patch_length * cfg.patch_size ** 2
    if cfg.use_final_proj:
        lin("decoder.final_proj", d, cfg.unpatch_channels * vol)
        ln("decoder.final_norm", cfg.unpatch_channels * vol)
    sd["decoder.last_layer.weight"] = torch.randn(
        3, cfg.unpatch_channels, 3, 3, 3, generator=g) * 0.05
    sd["decoder.last_layer.bias"] = torch.randn(3, generator=g) * 0.02
    return sd


TINY = ViTVAEConfig(video_size=16, video_length=4, patch_size=4,
                    patch_length=2, embed_dim=48, depth=2, num_heads=2,
                    z_chans=4, scale_factor=1.0)


def _pair(cfg, t, h, w):
    sd = make_vae_sd(cfg)
    params = convert_magi_vae_state_dict(sd, cfg)
    vae = ViTVAE(cfg, params=params)
    oracle = VAEOracle(sd, cfg)
    rng = np.random.default_rng(7)
    video = rng.standard_normal((1, t, h, w, cfg.in_chans)).astype(
        np.float32) * 0.5
    want_mo = oracle.encode_moments(torch.from_numpy(video))
    got_mo = vae.encode_moments(jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got_mo), want_mo.numpy(),
                               rtol=2e-4, atol=2e-4, err_msg="encode")
    z = want_mo[..., : cfg.z_chans]
    want_px = oracle.decode(z)
    got_px = np.asarray(
        jax.jit(vae._decode_impl)(vae.params, jnp.asarray(z.numpy())))
    np.testing.assert_allclose(got_px, want_px.numpy(),
                               rtol=2e-4, atol=2e-4, err_msg="decode")


def test_vitvae_matches_torch_oracle_pretrain_geometry():
    _pair(TINY, TINY.video_length, TINY.video_size, TINY.video_size)


def test_vitvae_matches_torch_oracle_resized_pos_embed():
    """Input geometry differs from pretrain — exercises the trilinear
    pos-embed resize (vae_module.py:400-406,526-534) and the rope tables
    built for the actual feature shape."""
    _pair(TINY, 6, 24, 8)


def test_vitvae_no_rope_prenorm_variant():
    """ln_in_attn=False / use_rope=False / no final_proj — the plain
    pre-norm ViT variant the ddconfig can select."""
    cfg = ViTVAEConfig(video_size=16, video_length=4, patch_size=4,
                       patch_length=2, embed_dim=64, depth=2, num_heads=4,
                       z_chans=4, ln_in_attn=False, use_rope=False,
                       use_final_proj=False, scale_factor=1.0)
    _pair(cfg, 4, 16, 16)


def test_vitvae_ddconfig_roundtrip():
    dd = dict(video_size=16, video_length=4, patch_size=4, patch_length=2,
              embed_dim=48, depth=2, num_heads=2, z_chans=4,
              ln_in_attn=True, use_rope=True, with_cls_token=True,
              use_final_proj=True, double_z=True, qkv_bias=False)
    cfg = vitvae_config_from_ddconfig(dd, scale_factor=1.0)
    assert cfg.embed_dim == 48 and cfg.use_rope and cfg.scale_factor == 1.0
