"""FULL-FORWARD numerical parity: the JAX causal DiT vs a torch oracle
implementing the reference equations (`inferix/models/self_forcing/
causal_model.py` CausalWanSelfAttention/Block/Head + `wan_base/components.py`)
on a shared state dict. This is the strongest single piece of evidence that
the TPU redesign computes the same function as the reference architecture."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.kvcache.cache import init_kv_cache
from inferix_tpu.models.wan.causal_dit import (
    dit_forward_inference,
    make_statics,
    precompute_crossattn_cache,
)
from inferix_tpu.ops.rope import build_rope_tables
from inferix_tpu.utils.checkpoint import convert_causal_wan_state_dict

from test_checkpoint_and_text import _torch_causal_wan_sd
from _torch_oracles import rope_params


def _t5ln(x, eps=1e-6, w=None, b=None):
    out = F.layer_norm(x, (x.shape[-1],), eps=eps)
    if w is not None:
        out = out * w + b
    return out


def _rms(x, w, eps=1e-6):
    out = x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    return out.type_as(x) * w


def _rope_apply_torch(x, f, h, w_, head_dim, start_frame=0):
    """Reference causal_rope_apply (complex pairs, 3-axis split)."""
    c = head_dim // 2
    c_h = c // 3
    c_t = c - 2 * c_h
    ft = rope_params(64, 2 * c_t)
    fh = rope_params(64, 2 * c_h)
    fw = rope_params(64, 2 * c_h)
    b, L, n, d = x.shape
    out = []
    for i in range(b):
        x_i = torch.view_as_complex(x[i].to(torch.float64).reshape(L, n, -1, 2))
        freqs_i = torch.cat([
            ft[start_frame:start_frame + f].view(f, 1, 1, -1).expand(f, h, w_, -1),
            fh[:h].view(1, h, 1, -1).expand(f, h, w_, -1),
            fw[:w_].view(1, 1, w_, -1).expand(f, h, w_, -1),
        ], dim=-1).reshape(L, 1, -1)
        out.append(torch.view_as_real(x_i * freqs_i).flatten(2))
    return torch.stack(out).to(x.dtype)


def torch_oracle_forward(sd, cfg, x, t, context):
    """x: [B, C, F, H, W]; t: [B, F]; context: [B, text_len, text_dim].
    One block forward with empty cache (current_start=0) — the reference
    `_forward_inference` path, cache covering exactly this block."""
    B = x.shape[0]
    f, hh, ww = x.shape[2], x.shape[3], x.shape[4]
    pt, ph, pw = cfg.patch_size
    gh, gw = hh // ph, ww // pw
    d = cfg.dim
    nheads = cfg.num_heads
    hd = cfg.head_dim

    def lin(name, v):
        return v @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]

    # patch embedding
    conv = torch.nn.Conv3d(cfg.in_dim, d, cfg.patch_size, stride=cfg.patch_size)
    conv.weight.data = sd["patch_embedding.weight"]
    conv.bias.data = sd["patch_embedding.bias"]
    tokens = conv(x).flatten(2).transpose(1, 2)  # [B, L, d]
    L = tokens.shape[1]
    frame_seq = L // f

    # time embeddings (reference sinusoidal: [cos | sin])
    half = cfg.freq_dim // 2
    pos = t.flatten().to(torch.float64)
    sinus = torch.outer(pos, torch.pow(
        10000, -torch.arange(half, dtype=torch.float64) / half))
    emb = torch.cat([torch.cos(sinus), torch.sin(sinus)], dim=1).float()
    e = lin("time_embedding.2", F.silu(lin("time_embedding.0", emb)))
    e0 = lin("time_projection.1", F.silu(e)).unflatten(1, (6, d)) \
        .unflatten(0, t.shape)                      # [B, F, 6, d]
    e_head = e.unflatten(0, t.shape).unsqueeze(2)   # [B, F, 1, d]

    # text embedding
    ctx = lin("text_embedding.2",
              F.gelu(lin("text_embedding.0", context), approximate="tanh"))

    h_x = tokens
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        mod = (sd[f"{p}.modulation"].unsqueeze(1) + e0).chunk(6, dim=2)
        # self attention
        y = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + mod[1]) + mod[0]
        y = y.flatten(1, 2)
        q = _rms(lin(f"{p}.self_attn.q", y), sd[f"{p}.self_attn.norm_q.weight"]) \
            .view(B, L, nheads, hd)
        k = _rms(lin(f"{p}.self_attn.k", y), sd[f"{p}.self_attn.norm_k.weight"]) \
            .view(B, L, nheads, hd)
        v = lin(f"{p}.self_attn.v", y).view(B, L, nheads, hd)
        q = _rope_apply_torch(q, f, gh, gw, hd)
        k = _rope_apply_torch(k, f, gh, gw, hd)
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float()).transpose(1, 2).reshape(B, L, d)
        y = lin(f"{p}.self_attn.o", attn)
        h_x = h_x + (y.unflatten(1, (f, frame_seq)) * mod[2]).flatten(1, 2)

        # cross attention (affine norm3)
        cy = _t5ln(h_x, w=sd[f"{p}.norm3.weight"], b=sd[f"{p}.norm3.bias"])
        cq = _rms(lin(f"{p}.cross_attn.q", cy),
                  sd[f"{p}.cross_attn.norm_q.weight"]).view(B, -1, nheads, hd)
        ck = _rms(lin(f"{p}.cross_attn.k", ctx),
                  sd[f"{p}.cross_attn.norm_k.weight"]).view(B, -1, nheads, hd)
        cv = lin(f"{p}.cross_attn.v", ctx).view(B, -1, nheads, hd)
        xa = F.scaled_dot_product_attention(
            cq.transpose(1, 2).float(), ck.transpose(1, 2).float(),
            cv.transpose(1, 2).float()).transpose(1, 2).reshape(B, -1, d)
        h_x = h_x + lin(f"{p}.cross_attn.o", xa)

        # ffn
        y = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + mod[4]) + mod[3]
        y = lin(f"{p}.ffn.2",
                F.gelu(lin(f"{p}.ffn.0", y.flatten(1, 2)), approximate="tanh"))
        h_x = h_x + (y.unflatten(1, (f, frame_seq)) * mod[5]).flatten(1, 2)

    # head
    hm = (sd["head.modulation"].unsqueeze(1) + e_head).chunk(2, dim=2)
    out = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + hm[1]) + hm[0]
    out = lin("head.head", out.flatten(1, 2))
    # unpatchify [B, L, pt*ph*pw*out] -> [B, C_out, F, H, W]
    out = out.view(B, f, gh, gw, pt, ph, pw, cfg.out_dim)
    out = out.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(
        B, cfg.out_dim, f * pt, hh, ww)
    return out


def test_full_forward_matches_torch_oracle():
    cfg = tiny_test_config().model
    sd = _torch_causal_wan_sd(cfg, seed=3)
    g = torch.Generator().manual_seed(11)
    B, f, hh, ww = 1, 2, 8, 8
    x_t = torch.randn(B, cfg.in_dim, f, hh, ww, generator=g)
    t_t = torch.tensor([[500.0, 500.0]])
    ctx_t = torch.randn(B, cfg.text_len, cfg.text_dim, generator=g) * 0.1

    want = torch_oracle_forward(sd, cfg, x_t, t_t, ctx_t)

    params = convert_causal_wan_state_dict(sd, cfg, dtype=jnp.float32)
    statics = make_statics(cfg, B, f, hh, ww, jnp.float32)
    tables = build_rope_tables(cfg.head_dim, 64)
    xattn = jax.jit(
        lambda p, c: precompute_crossattn_cache(p, cfg, c)
    )(params, jnp.asarray(ctx_t.numpy()))
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())  # channels-last
    flow, _ = dit_forward_inference(
        params, statics, tables, x_j, jnp.asarray(t_t.numpy()), xattn,
        init_kv_cache(statics.spec), jnp.int32(0),
    )
    got = np.asarray(flow).transpose(0, 4, 1, 2, 3)  # -> [B, C, F, H, W]
    want_np = want.detach().numpy()
    denom = np.abs(want_np).max()
    rel = np.abs(got - want_np).max() / denom
    assert rel < 2e-3, f"full-forward relative error {rel:.2e}"


def torch_oracle_two_block(sd, cfg, x1, x2, t1, t2, ctx):
    """Reference semantics for the CACHED case: block 1 is forwarded first
    (its K/V persist), then block 2 attends [cache(block1); block2] with
    rope offset start_frame = f1 (`causal_model.py:259-315`)."""
    B = x1.shape[0]
    f1, f2 = x1.shape[2], x2.shape[2]
    hh, ww = x1.shape[3], x1.shape[4]
    pt, ph, pw = cfg.patch_size
    gh, gw = hh // ph, ww // pw
    d, nheads, hd = cfg.dim, cfg.num_heads, cfg.head_dim

    def lin(name, v):
        return v @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]

    conv = torch.nn.Conv3d(cfg.in_dim, d, cfg.patch_size, stride=cfg.patch_size)
    conv.weight.data = sd["patch_embedding.weight"]
    conv.bias.data = sd["patch_embedding.bias"]

    def embed_time(t):
        half = cfg.freq_dim // 2
        pos = t.flatten().to(torch.float64)
        sinus = torch.outer(pos, torch.pow(
            10000, -torch.arange(half, dtype=torch.float64) / half))
        emb = torch.cat([torch.cos(sinus), torch.sin(sinus)], dim=1).float()
        e = lin("time_embedding.2", F.silu(lin("time_embedding.0", emb)))
        e0 = lin("time_projection.1", F.silu(e)).unflatten(1, (6, d)) \
            .unflatten(0, t.shape)
        return e.unflatten(0, t.shape).unsqueeze(2), e0

    ctx_emb = lin("text_embedding.2",
                  F.gelu(lin("text_embedding.0", ctx), approximate="tanh"))

    caches = {}

    def run_block(x, t, start_frame, use_cache):
        f = x.shape[2]
        tokens = conv(x).flatten(2).transpose(1, 2)
        L = tokens.shape[1]
        frame_seq = L // f
        e_head, e0 = embed_time(t)
        h_x = tokens
        for i in range(cfg.num_layers):
            p = f"blocks.{i}"
            mod = (sd[f"{p}.modulation"].unsqueeze(1) + e0).chunk(6, dim=2)
            y = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + mod[1]) + mod[0]
            y = y.flatten(1, 2)
            q = _rms(lin(f"{p}.self_attn.q", y),
                     sd[f"{p}.self_attn.norm_q.weight"]).view(B, L, nheads, hd)
            k = _rms(lin(f"{p}.self_attn.k", y),
                     sd[f"{p}.self_attn.norm_k.weight"]).view(B, L, nheads, hd)
            v = lin(f"{p}.self_attn.v", y).view(B, L, nheads, hd)
            q = _rope_apply_torch(q, f, gh, gw, hd, start_frame=start_frame)
            k = _rope_apply_torch(k, f, gh, gw, hd, start_frame=start_frame)
            if use_cache and i in caches:
                k_full = torch.cat([caches[i][0], k], dim=1)
                v_full = torch.cat([caches[i][1], v], dim=1)
            else:
                k_full, v_full = k, v
            caches[i] = (k_full.detach(), v_full.detach())
            attn = F.scaled_dot_product_attention(
                q.transpose(1, 2).float(), k_full.transpose(1, 2).float(),
                v_full.transpose(1, 2).float()).transpose(1, 2).reshape(B, L, d)
            h_x = h_x + (lin(f"{p}.self_attn.o", attn)
                         .unflatten(1, (f, frame_seq)) * mod[2]).flatten(1, 2)

            cy = _t5ln(h_x, w=sd[f"{p}.norm3.weight"], b=sd[f"{p}.norm3.bias"])
            cq = _rms(lin(f"{p}.cross_attn.q", cy),
                      sd[f"{p}.cross_attn.norm_q.weight"]).view(B, -1, nheads, hd)
            ck = _rms(lin(f"{p}.cross_attn.k", ctx_emb),
                      sd[f"{p}.cross_attn.norm_k.weight"]).view(B, -1, nheads, hd)
            cv = lin(f"{p}.cross_attn.v", ctx_emb).view(B, -1, nheads, hd)
            xa = F.scaled_dot_product_attention(
                cq.transpose(1, 2).float(), ck.transpose(1, 2).float(),
                cv.transpose(1, 2).float()).transpose(1, 2).reshape(B, -1, d)
            h_x = h_x + lin(f"{p}.cross_attn.o", xa)

            y = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + mod[4]) + mod[3]
            y = lin(f"{p}.ffn.2", F.gelu(lin(f"{p}.ffn.0", y.flatten(1, 2)),
                                         approximate="tanh"))
            h_x = h_x + (y.unflatten(1, (f, frame_seq)) * mod[5]).flatten(1, 2)

        hm = (sd["head.modulation"].unsqueeze(1) + e_head).chunk(2, dim=2)
        out = _t5ln(h_x).unflatten(1, (f, frame_seq)) * (1 + hm[1]) + hm[0]
        out = lin("head.head", out.flatten(1, 2))
        out = out.view(B, f, gh, gw, pt, ph, pw, cfg.out_dim)
        return out.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            B, cfg.out_dim, f * pt, hh, ww)

    run_block(x1, t1, start_frame=0, use_cache=False)       # fills the cache
    return run_block(x2, t2, start_frame=f1, use_cache=True)


def test_cached_block_matches_torch_oracle():
    """Block 2 attending to block 1's cached KV with rope frame offsets —
    the actual semi-AR step — matches the torch oracle."""
    cfg = tiny_test_config().model
    sd = _torch_causal_wan_sd(cfg, seed=5)
    g = torch.Generator().manual_seed(13)
    B, hh, ww = 1, 8, 8
    x1 = torch.randn(B, cfg.in_dim, 1, hh, ww, generator=g)
    x2 = torch.randn(B, cfg.in_dim, 1, hh, ww, generator=g)
    t1 = torch.tensor([[0.0]])
    t2 = torch.tensor([[750.0]])
    ctx = torch.randn(B, cfg.text_len, cfg.text_dim, generator=g) * 0.1

    want = torch_oracle_two_block(sd, cfg, x1, x2, t1, t2, ctx)

    params = convert_causal_wan_state_dict(sd, cfg, dtype=jnp.float32)
    statics = make_statics(cfg, B, 1, hh, ww, jnp.float32)
    tables = build_rope_tables(cfg.head_dim, 64)
    xattn = jax.jit(
        lambda p, c: precompute_crossattn_cache(p, cfg, c)
    )(params, jnp.asarray(ctx.numpy()))
    cache = init_kv_cache(statics.spec)
    to_j = lambda v: jnp.asarray(v.permute(0, 2, 3, 4, 1).numpy())
    _, cache = dit_forward_inference(
        params, statics, tables, to_j(x1), jnp.asarray(t1.numpy()), xattn,
        cache, jnp.int32(0))
    flow2, _ = dit_forward_inference(
        params, statics, tables, to_j(x2), jnp.asarray(t2.numpy()), xattn,
        cache, jnp.int32(statics.geo.frame_seq))

    got = np.asarray(flow2).transpose(0, 4, 1, 2, 3)
    want_np = want.detach().numpy()
    rel = np.abs(got - want_np).max() / np.abs(want_np).max()
    assert rel < 2e-3, f"cached-block relative error {rel:.2e}"
