"""Torch-CPU oracle implementations of the reference math, used ONLY as test
golden references (the reference package itself is not importable here —
its deps aren't installed — so these re-derive the same equations from the
published formulas: complex-pair 3D rope, shifted flow-match sigmas, masked
softmax attention). Kept minimal and test-only."""
import math

import torch


def rope_params(max_seq_len, dim, theta=10000):
    freqs = torch.outer(
        torch.arange(max_seq_len),
        1.0 / torch.pow(theta, torch.arange(0, dim, 2).to(torch.float64).div(dim)),
    )
    return torch.polar(torch.ones_like(freqs), freqs)


def causal_rope_apply(x, f, h, w, freqs_t, freqs_h, freqs_w, start_frame=0):
    """x: [B, L, n, d] with L = f*h*w. Complex multiply per (t,h,w) axis."""
    b, L, n, d = x.shape
    c = d // 2
    out = []
    for i in range(b):
        x_i = torch.view_as_complex(
            x[i].to(torch.float64).reshape(L, n, -1, 2)
        )
        freqs_i = torch.cat(
            [
                freqs_t[start_frame : start_frame + f].view(f, 1, 1, -1).expand(f, h, w, -1),
                freqs_h[:h].view(1, h, 1, -1).expand(f, h, w, -1),
                freqs_w[:w].view(1, 1, w, -1).expand(f, h, w, -1),
            ],
            dim=-1,
        ).reshape(L, 1, -1)
        out.append(torch.view_as_real(x_i * freqs_i).flatten(2))
    return torch.stack(out).to(x.dtype)


class FlowMatchSchedulerOracle:
    def __init__(self, num_inference_steps=1000, num_train_timesteps=1000,
                 shift=8.0, sigma_max=1.0, sigma_min=0.0, extra_one_step=True):
        if extra_one_step:
            sigmas = torch.linspace(sigma_max, sigma_min,
                                    num_inference_steps + 1)[:-1]
        else:
            sigmas = torch.linspace(sigma_max, sigma_min, num_inference_steps)
        self.sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.timesteps = self.sigmas * num_train_timesteps

    def add_noise(self, x0, noise, timestep):
        tid = torch.argmin(
            (self.timesteps.unsqueeze(0) - timestep.unsqueeze(1)).abs(), dim=1
        )
        sigma = self.sigmas[tid].reshape(-1, *([1] * (x0.ndim - 1)))
        return (1 - sigma) * x0 + sigma * noise


def masked_attention(q, k, v, kv_mask=None):
    """q: [B,Sq,H,D], k/v: [B,Skv,H,D], kv_mask: [Skv] bool."""
    scale = q.shape[-1] ** -0.5
    logits = torch.einsum("bqhd,bkhd->bhqk", q.double(), k.double()) * scale
    if kv_mask is not None:
        logits = logits.masked_fill(~kv_mask[None, None, None, :], float("-inf"))
    probs = torch.softmax(logits, dim=-1)
    return torch.einsum("bhqk,bkhd->bqhd", probs, v.double()).to(q.dtype)
