"""MAGI-1 VideoDiT (ardf) in functional JAX — reference-faithful layer graph.

Parity target: `inferix/models/magi/dit/dit_model.py:60-671` +
`dit_module.py:180-1391`. The computation graph per layer is the reference's
PARALLEL attention design (not sequential pre-norm blocks):

    ln   = LayerNorm(h)                       (CustomLayerNormLinear)
    q    = rope(headLN(ln @ Wq))              (fp32 head-dim LN, then rope)
    k    = rope(headLN(ln @ Wk)); v = ln @ Wv (GQA: 8 kv groups)
    core = chunk-causal-attention(q, cached k/v)
    qx   = headLN(ln @ Wqx)                   (cross query, NO rope)
    yk,yv= headLN(y @ Wkv_xattn)              (caption K/V, group-interleaved)
    xatt = attention(qx, yk, yv, caption mask)
    h1   = interleave_groups(core, xatt) @ Wproj   (fp32 unless fp8-quant)
    g_msa, g_mlp = softcap(AdaProj(silu(cond)), 1)  (gate-ONLY modulation)
    h    = PostNorm(h1 * g_msa[chunk]) + h          (bias_modulate_add)
    mlp  = fc2(gelu(fc1(LayerNorm(h))))
    h    = PostNorm2(mlp * g_mlp[chunk]) + h
final: FinalLayerNorm(h.float()) @ Wfinal           (no modulation)

All LayerNorms are zero-centered-gamma (apply_layernorm_1p: weight = 1 + w)
with bias. Rope uses the reference's LEARNED frequency bands
(`LearnableRotaryEmbeddingCat`, dit_module.py:723-775): bands [hd//8],
3 axes x bands angles with center-aligned spatial coords and ref-shape
rescaling, applied rotate-half (flash apply_rotary_emb, non-interleaved) to
the first 2*(3*hd//8) dims of each head.

FP8 distill-quant checkpoints (`dit_module.py:367-490`): middle layers
(not first/last) carry e4m3 weights + scales; activations go through
`div_clamp_to` (clamp(x/scale) to e4m3) and the matmul is computed as
(A*A_scale) @ (W_q*weight_scale) — fp8 is a memory/fidelity format here,
compute runs on the bf16 MXU (v5e has no fp8 ALUs).

TPU-first redesign retained from round 1: chunks are uniform
(chunk_width x frame_seq tokens), so the reference's packed q/k ranges +
flex-flash-attention collapse into per-chunk prefix-span flash calls over
the same ring-buffer KV cache as the Wan family; per-range (range_mod)
gating is a [B, n_chunks] broadcast.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...kvcache.cache import KVCache, KVCacheSpec, init_kv_cache, valid_mask, write_block
from ...ops.attention import cache_attention
from ...ops.norms import layer_norm
from ...ops.rope import RopeTables, build_rope_tables

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MagiModelConfig:
    num_layers: int = 34
    hidden_size: int = 3072
    ffn_hidden_size: int = 12288
    num_attention_heads: int = 24
    num_query_groups: int = 8       # GQA kv heads
    kv_channels: int = 128          # head dim
    layernorm_epsilon: float = 1e-6
    apply_layernorm_1p: bool = True  # zero-centered gamma (weight = 1 + w)
    patch_size: int = 2
    t_patch_size: int = 1
    in_channels: int = 16
    out_channels: int = 16
    cond_hidden_ratio: float = 0.25
    xattn_cond_hidden_ratio: float = 1.0
    caption_channels: int = 4096
    caption_max_length: int = 800
    chunk_width: int = 6
    rope_max_seq_len: int = 1024
    x_rescale_factor: float = 1.0
    # 24B config (`example/magi/configs/24B/*.json`): SwiGLU MLP
    # (fc1 -> 2*ffn, silu_and_mul) and 16-channel VAE latents duplicated to
    # the model's 32 input channels / first 16 output channels kept
    # (dit_model.py:270-272,353-355)
    gated_linear_unit: bool = False
    half_channel_vae: bool = False

    @property
    def cond_dim(self) -> int:
        return int(self.hidden_size * self.cond_hidden_ratio)

    @property
    def xattn_dim(self) -> int:
        return int(self.hidden_size * self.xattn_cond_hidden_ratio)

    @property
    def latent_channels(self) -> int:
        """Channels of the latents the pipeline manipulates (the VAE's z)."""
        return 16 if self.half_channel_vae else self.in_channels


def tiny_magi_config() -> MagiModelConfig:
    return MagiModelConfig(
        num_layers=2, hidden_size=128, ffn_hidden_size=256,
        num_attention_heads=4, num_query_groups=2, kv_channels=32,
        caption_channels=64, caption_max_length=8, chunk_width=2,
        rope_max_seq_len=64,
    )


@dataclasses.dataclass(frozen=True)
class MagiGeometry:
    latent_h: int
    latent_w: int
    chunk_width: int
    patch: int

    @property
    def grid_h(self) -> int:
        return self.latent_h // self.patch

    @property
    def grid_w(self) -> int:
        return self.latent_w // self.patch

    @property
    def frame_seq(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def chunk_tokens(self) -> int:
        return self.chunk_width * self.frame_seq


class MagiStatics(NamedTuple):
    cfg: MagiModelConfig
    spec: KVCacheSpec
    geo: MagiGeometry
    # in-forward CP over the window (reference FullyParallelAttention
    # cp-strategy dispatch none/ulysses/cso, dit_module.py:1087-1195):
    # "cso" runs the per-chunk shuffled-Ulysses pipeline of
    # `parallel/distributed_attention.cso_chunk_attention` inside each layer
    mesh: object = None
    sp_mode: str = "none"


def make_magi_statics(cfg: MagiModelConfig, batch: int, latent_h: int,
                      latent_w: int, max_chunks: int,
                      dtype=jnp.bfloat16, mesh=None,
                      sp_mode: str = "none", kv_dtype=None,
                      quantize_kv: bool = False,
                      kv_head_major: bool = False,
                      kv_alloc_multiple: int = 0) -> MagiStatics:
    """kv_dtype overrides the window cache's storage dtype (e.g.
    float8_e4m3fn: scale-free fp8, cast-only in-kernel dequant — halves the
    window cache, which is what lets the 4.5B reference window config
    [4 chunks x 12150 tokens] fit one 15.75 GB v5e). quantize_kv=True
    selects the int8 + per-(token, head)-scale cache instead: same halving,
    but the span kernel's column-scaling dequant runs at the bf16 kernel's
    rate, where the e4m3 cast-only dequant runs at half (157 vs 78 TF/s at
    the 4.5B window shape, exp/r4_magi_attn.py) — the preferred serving
    cache on v5e."""
    geo = MagiGeometry(latent_h, latent_w, cfg.chunk_width, cfg.patch_size)
    max_tokens = max_chunks * geo.chunk_tokens
    alloc = (-(-max_tokens // kv_alloc_multiple) * kv_alloc_multiple
             if kv_alloc_multiple else 0)
    spec = KVCacheSpec(
        num_layers=cfg.num_layers,
        batch=batch,
        max_tokens=max_tokens,
        alloc_tokens=alloc,
        num_kv_heads=cfg.num_query_groups,
        head_dim=cfg.kv_channels,
        dtype=kv_dtype if kv_dtype is not None else dtype,
        quantized=quantize_kv,
        head_major=kv_head_major,
    )
    if sp_mode not in ("none", "cso", "ulysses"):
        raise ValueError(f"MAGI sp_mode must be 'none', 'cso' or "
                         f"'ulysses', got {sp_mode!r}")
    if sp_mode != "none" and (
            mesh is None or (mesh.shape.get("sp", 1) <= 1
                             and mesh.shape.get("tp", 1) <= 1)):
        # an explicit island request without a sharded mesh is a
        # misconfiguration, not a fallback case — fail loudly. tp-only
        # meshes DO take the island: on real TPUs the Pallas span kernel
        # cannot be GSPMD-auto-partitioned, so head sharding must run
        # inside the shard_map island (the sp=1 all_to_all is an identity).
        raise ValueError(
            f"sp_mode={sp_mode!r} requires a mesh with sp>1 or tp>1 "
            f"(got mesh={None if mesh is None else dict(mesh.shape)})")
    return MagiStatics(cfg=cfg, spec=spec, geo=geo, mesh=mesh,
                       sp_mode=sp_mode)


# ---------------------------------------------------------------------------
# Learned rope (LearnableRotaryEmbeddingCat, dit_module.py:723-775)
# ---------------------------------------------------------------------------

def default_rope_bands(head_dim: int, temperature: float = 10000.0
                       ) -> jax.Array:
    """freq_bands(num_bands=hd//8, step=1): 1/temp^(i/nb) — the init the
    learned checkpoint bands replace (dit_module.py:594-599)."""
    nb = head_dim // 8
    exp = jnp.arange(nb, dtype=jnp.float32) / nb
    return 1.0 / (temperature ** exp)


def magi_rope_angles(
    bands: jax.Array,       # [hd//8] learned frequency bands
    t_total: int,           # temporal length INCLUDING clean prefix
    grid_h: int,
    grid_w: int,
) -> jax.Array:
    """Rotation angles [T*H*W, 3*nb] for the full (t_total, H, W) grid —
    the reference builds rope over T_total and slices the window tail
    (`dit_model.py:163-165`). Spatial coords are center-aligned and
    ref-shape-rescaled with rescale_factor sqrt(H*W/256)
    (build_fourier_pos_embed in_pixels=False path, dit_module.py:744-760)."""
    rf = math.sqrt((grid_h * grid_w) / (16.0 * 16.0))

    def axis_coords(n: int, centered: bool, ref: float) -> jnp.ndarray:
        t = jnp.arange(n, dtype=jnp.float32)
        if centered:
            t = t - (n - 1) / 2.0
        # eva resize: x / (f-1) * (r-1); identity when ref == n
        if n > 1 and abs(ref - n) > 1e-9:
            t = t / (n - 1) * (ref - 1.0)
        return t

    tt = axis_coords(t_total, False, float(t_total))
    th = axis_coords(grid_h, True, grid_h / rf)
    tw = axis_coords(grid_w, True, grid_w / rf)
    grid = jnp.stack(jnp.meshgrid(tt, th, tw, indexing="ij"), axis=-1)
    # [T, H, W, 3, nb] -> [THW, 3*nb]
    pos = grid[..., None] * bands
    return pos.reshape(t_total * grid_h * grid_w, -1)


def apply_rope_magi(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate-half rope on the first 2*angles.shape[-1] dims of the head
    (flash_attn apply_rotary_emb, non-interleaved), rest pass through.
    x: [..., S, H, D]; angles: [S, rot/2]."""
    orig = x.dtype
    half = angles.shape[-1]
    rot = 2 * half
    xf = x.astype(jnp.float32)
    x1 = xf[..., :half]
    x2 = xf[..., half:rot]
    tail = xf[..., rot:]
    cos = jnp.cos(angles)[..., :, None, :]
    sin = jnp.sin(angles)[..., :, None, :]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2, tail], axis=-1).astype(orig)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _lin(key, i, o, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5)
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((o,), dtype)
    return p


def _ln_params(h, dtype):
    # zero-centered gamma: effective weight = 1 + w
    return {"w": jnp.zeros((h,), dtype), "b": jnp.zeros((h,), dtype)}


def init_magi_block(key, cfg: MagiModelConfig, dtype) -> Params:
    ks = jax.random.split(key, 12)
    h = cfg.hidden_size
    hd = cfg.kv_channels
    q_dim = cfg.num_attention_heads * hd
    kv_dim = cfg.num_query_groups * hd
    return {
        "ln_qkv": _ln_params(h, dtype),
        "q": _lin(ks[0], h, q_dim, dtype, bias=False),
        "qx": _lin(ks[1], h, q_dim, dtype, bias=False),
        "k": _lin(ks[2], h, kv_dim, dtype, bias=False),
        "v": _lin(ks[3], h, kv_dim, dtype, bias=False),
        "q_ln": _ln_params(hd, dtype),
        "qx_ln": _ln_params(hd, dtype),
        "k_ln": _ln_params(hd, dtype),
        "kx_ln": _ln_params(hd, dtype),
        "kv_xattn": _lin(ks[4], cfg.xattn_dim, 2 * kv_dim, dtype, bias=False),
        "proj": _lin(ks[5], 2 * q_dim, h, dtype, bias=False),
        "ada_proj": _lin(ks[6], cfg.cond_dim, 2 * h, jnp.float32),
        "self_post_norm": _ln_params(h, jnp.float32),
        "mlp_post_norm": _ln_params(h, jnp.float32),
        "mlp_ln": _ln_params(h, dtype),
        "fc1": _lin(ks[7], h,
                    (2 if cfg.gated_linear_unit else 1) * cfg.ffn_hidden_size,
                    dtype, bias=False),
        "fc2": _lin(ks[8], cfg.ffn_hidden_size, h, dtype, bias=False),
    }


def init_magi_params(key, cfg: MagiModelConfig, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, 10)
    h = cfg.hidden_size
    cond = cfg.cond_dim
    patch_in = cfg.t_patch_size * cfg.patch_size**2 * cfg.in_channels
    patch_out = cfg.t_patch_size * cfg.patch_size**2 * cfg.out_channels

    blocks = [init_magi_block(k, cfg, dtype)
              for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "x_embedder": _lin(keys[1], patch_in, h, dtype, bias=False),
        "t_embedder": {
            "fc1": _lin(keys[2], 256, cond, jnp.float32),
            "fc2": _lin(keys[3], cond, cond, jnp.float32),
        },
        "y_embedder": {
            "y_proj_xattn": _lin(keys[4], cfg.caption_channels,
                                 cfg.xattn_dim, dtype),
            "y_proj_adaln": _lin(keys[5], cfg.caption_channels, cond,
                                 jnp.float32),
            "null_caption_embedding": (
                jax.random.normal(keys[6],
                                  (cfg.caption_max_length,
                                   cfg.caption_channels), jnp.float32)
                * 0.02).astype(dtype),
        },
        "rope_bands": default_rope_bands(cfg.kv_channels),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layernorm": _ln_params(h, jnp.float32),
        "final_linear": _lin(keys[7], h, patch_out, dtype, bias=False),
    }


# ---------------------------------------------------------------------------
# Linears (bf16 / fp8-distill-quant)
# ---------------------------------------------------------------------------

_E4M3_MAX = 448.0


def _qdq_e4m3(x: jax.Array) -> jax.Array:
    """Quantize-dequantize through float8_e4m3 (div_clamp_to fidelity;
    e4m3 is a memory format — v5e computes in bf16)."""
    c = jnp.clip(x, -_E4M3_MAX, _E4M3_MAX)
    return c.astype(jnp.float8_e4m3fn).astype(x.dtype)


def split_gated_fc1(params: Params, ffn_hidden_size: int) -> Params:
    """Rewrite every block's gated fc1 from the concatenated [h, gate|up]
    layout into gate/up-SEPARATE leaves ("fc1" -> gate, "fc1_up" -> up).

    Deployment transform for tensor-parallel gated MLPs (24B SwiGLU): with
    fc1's output dim tp-sharded, slicing the [.., 2*ffn] activation into
    halves crosses shard boundaries and GSPMD inserts collective-permutes
    — wasted wire at best, and a rendezvous deadlock inside the partially-
    manual pp pipeline (exp/r17_pp_compose_bisect.py). Separate leaves make
    silu(gate)*up fully shard-local. Identical math; applied by
    MagiPipeline when the mesh has tp>1 and the config is gated. Splits any
    fc1 leaf whose last dim is 2*ffn (w / w_q / per-out-channel scale);
    input-dim or scalar leaves (act_scale, smooth_scale, input_scale) are
    shared by both halves."""
    def split_block(blk):
        if not isinstance(blk, dict) or "fc1" not in blk \
                or "fc1_up" in blk:
            return blk
        gate, up = {}, {}
        for name, leaf in blk["fc1"].items():
            if getattr(leaf, "ndim", 0) >= 1 \
                    and leaf.shape[-1] == 2 * ffn_hidden_size:
                gate[name] = leaf[..., :ffn_hidden_size]
                up[name] = leaf[..., ffn_hidden_size:]
            else:
                gate[name] = leaf
                up[name] = leaf
        out = dict(blk)
        out["fc1"] = gate
        out["fc1_up"] = up
        return out

    out = dict(params)
    for key in ("blocks", "blocks_mid", "blocks_first", "blocks_last"):
        if key in out:
            if isinstance(out[key], list):
                out[key] = [split_block(b) for b in out[key]]
            else:
                out[key] = split_block(out[key])
    return out


def magi_int8_linear(p: Params, x: jax.Array,
                     act: Optional[str] = None) -> jax.Array:
    """W8A8 int8 linear (the MAGI serving path), optionally folding the
    mlp activation (gelu_exact / SwiGLU silu_mul) into the per-token
    activation-quant pass. The dynamic quant routes through
    `quant.api._quantize_act`: with the fused kernel enabled it is ONE
    Pallas pass (read bf16 -> write s8 + scale) instead of the XLA chain
    that materializes the activation in f32 first (the same cost class the
    round-3 trace named on Wan — op_breakdown.log %multiply_reduce /
    %fusion.317)."""
    from ...quant.api import _quantize_act

    *lead, k = x.shape
    x_q, x_scale = _quantize_act(x.reshape(-1, k), act=act)
    acc = jax.lax.dot_general(
        x_q, p["w_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * x_scale.astype(jnp.float32)
           * p["scale"].astype(jnp.float32).reshape(1, -1))
    return out.astype(x.dtype).reshape(*lead, out.shape[-1])


def magi_linear(p: Params, x: jax.Array) -> jax.Array:
    """Plain / fp8 distill-quant / int8 W8A8 linear.

    fp8 params (reference PerTensor/PerChannelQuantizedFp8Linear,
    dit_module.py:434-490): w_q e4m3 [in, out], weight_scale scalar,
    and either act_scale [in] (per-tensor: div_clamp_to by input_scale,
    rescale by it — SmoothQuant with scales folded into weights) or
    smooth_scale [in] + input_scale scalar (per-channel). v5e has no fp8
    ALUs, so this path dequantizes weights per forward — fidelity-exact to
    the checkpoint but ~5x slower than the matmul bound at 4.5B. The
    SERVING path is the int8 branch: `quant.api.magi_distill_quant_to_int8`
    requantizes the checkpoint at load ({w_q int8, scale [out]}) and the
    matmul runs on the MXU's native int8 dot with dynamic per-token
    activation quantization (the Wan W8A8 recipe)."""
    if "w_q" in p:
        if p["w_q"].dtype == jnp.int8:
            return magi_int8_linear(p, x)
        xf = x.astype(jnp.float32)
        if "smooth_scale" in p:
            xq = _qdq_e4m3(xf / p["smooth_scale"]) * p["input_scale"]
        else:
            xq = _qdq_e4m3(xf / p["act_scale"]) * p["act_scale"]
        w = p["w_q"].astype(jnp.float32) * p["weight_scale"]
        return jnp.dot(xq.astype(x.dtype), w.astype(x.dtype))
    out = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _ln(p, x, eps, zero_centered=True):
    w = p["w"].astype(jnp.float32)
    if zero_centered:
        w = 1.0 + w
    return layer_norm(x, w, p["b"].astype(jnp.float32), eps)


def _softcap(x, cap=1.0):
    return cap * jnp.tanh(x.astype(jnp.float32) / cap)


# ---------------------------------------------------------------------------
# Layer
# ---------------------------------------------------------------------------

def _patchify(cfg: MagiModelConfig, geo: MagiGeometry, x: jax.Array) -> jax.Array:
    """x: [B, T, H, W, C] -> [B, T*gh*gw, patch_in]."""
    b, t, hh, ww, c = x.shape
    p = cfg.patch_size
    x = x.reshape(b, t, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t * (hh // p) * (ww // p), p * p * c)


def _unpatchify(cfg: MagiModelConfig, geo: MagiGeometry, x: jax.Array,
                t: int) -> jax.Array:
    b = x.shape[0]
    p = cfg.patch_size
    x = x.reshape(b, t, geo.grid_h, geo.grid_w, p, p, cfg.out_channels)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t, geo.latent_h, geo.latent_w, cfg.out_channels)


def _postprocess_velocity(cfg: MagiModelConfig, geo: MagiGeometry,
                          out: jax.Array, t: int) -> jax.Array:
    """forward_post_process (dit_model.py:341-359): unpatchify, keep the
    first 16 channels for half-channel VAE, undo x_rescale."""
    velocity = _unpatchify(cfg, geo, out, t)
    if cfg.half_channel_vae:
        velocity = velocity[..., :16]
    if cfg.x_rescale_factor != 1.0:
        velocity = velocity / cfg.x_rescale_factor
    return velocity


def _xattn_attend(cq: jax.Array, yk: jax.Array, yv: jax.Array,
                  cmask: jax.Array, rep: int, use_gqa: bool,
                  interpret: bool = False, mesh=None) -> jax.Array:
    """Caption cross-attention. use_gqa=True (TPU): the GQA fold reads the
    caption K/V once per kv group instead of materializing a jnp.repeat
    copy per query head (~2 x rep x cap_len x kv_dim bf16 of HBM traffic
    per layer saved). The caption masks are prefix masks (valid tokens,
    then padding — incl. the 50-token null mask and special-token
    prepends), so the popcount IS the span length (generate_chunks
    validates prefix-ness on the host).

    mesh (tp/sp > 1): the projections are head-sharded, and the Pallas
    kernel can't be GSPMD-auto-partitioned — route through the
    collective-free head-sharded island."""
    if mesh is not None:
        from ...parallel.distributed_attention import gqa_head_island

        return gqa_head_island(mesh, cq, yk, yv, kv_mask=cmask)
    if use_gqa and rep > 1:
        from ...ops.flash_attention import flash_attention_gqa

        kv_len = jnp.sum(cmask.astype(jnp.int32), axis=1)   # [B*nc]
        return flash_attention_gqa(cq, yk, yv, kv_len=kv_len,
                                   interpret=interpret)
    ck = jnp.repeat(yk, rep, axis=2)
    cv = jnp.repeat(yv, rep, axis=2)
    return cache_attention(cq, ck, cv, kv_mask=cmask)


def _magi_layer(
    blk: Params,
    h_x: jax.Array,            # [B, n_chunks*ct, hidden]
    cond: jax.Array,           # [B, n_chunks, cond_dim] fp32
    y: jax.Array,              # [B, n_chunks, cap_len, xattn_dim] (post proj+silu)
    caption_mask: jax.Array,   # [B, n_chunks, cap_len]
    layer_cache: tuple,        # (k, v) [B, Smax, nkv, hd] or
                               # (k, v, k_scale, v_scale) when quantized
    *,
    cfg: MagiModelConfig,
    spec: KVCacheSpec,
    n_chunks: int,
    ct: int,
    angles: jax.Array,         # [n_chunks*ct, 3*nb]
    token_ranges: jax.Array,
    current_start: jax.Array,
    current_end: jax.Array,
    mesh=None,
    sp_mode: str = "none",
    static_kv_spans: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, tuple]:
    """One MAGI transformer layer (reference TransformerLayer.forward,
    dit_module.py:1243-1320). Returns (h_x, new_layer_cache).

    static_kv_spans: optional host-known per-chunk span widths IN CHUNKS
    (upper bounds on kv_ranges[i,1]-kv_ranges[i,0]); when given, each
    chunk's span kernel runs with a span-sized grid instead of stepping
    over the whole padded cache (flash_attention max_span)."""
    b = h_x.shape[0]
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_query_groups,
                   cfg.kv_channels)
    rep = nh // nkv
    eps = cfg.layernorm_epsilon

    residual = h_x
    ln = _ln(blk["ln_qkv"], h_x, eps).astype(h_x.dtype)

    # --- self attention: q/k head-LN (fp32) then rope ---
    q = magi_linear(blk["q"], ln).reshape(b, -1, nh, hd)
    q = _ln(blk["q_ln"], q.astype(jnp.float32), eps)
    q = apply_rope_magi(q, angles).astype(h_x.dtype)
    k = magi_linear(blk["k"], ln).reshape(b, -1, nkv, hd)
    k = _ln(blk["k_ln"], k.astype(jnp.float32), eps)
    k = apply_rope_magi(k, angles).astype(h_x.dtype)
    v = magi_linear(blk["v"], ln).reshape(b, -1, nkv, hd)

    island_mesh = (mesh if mesh is not None
                   and sp_mode in ("cso", "ulysses") else None)
    if layer_cache is None:
        # prefix-free path (3-CFG uncond forward): each batch row is a lone
        # chunk attending only to its own live KV — no cache read or write
        # (reference generate_kv_range_for_uncondition, dit_model.py:91-100)
        new_cache = None
        if island_mesh is not None:
            # head-sharded projections: the kernel must run inside an
            # island (collective-free — every head attends independently)
            from ...parallel.distributed_attention import gqa_head_island

            core = gqa_head_island(island_mesh, q, k, v)
        elif rep > 1 and jax.default_backend() == "tpu":
            # GQA fold: no repeated-KV copy (see _xattn_attend)
            from ...ops.flash_attention import flash_attention_gqa

            core = flash_attention_gqa(q, k, v,
                                       kv_len=jnp.int32(k.shape[1]))
        else:
            core = cache_attention(q, jnp.repeat(k, rep, axis=2),
                                   jnp.repeat(v, rep, axis=2))
    else:
        new_cache = write_block(spec, layer_cache[0], layer_cache[1], k, v,
                                current_start,
                                *(layer_cache[2:] if spec.quantized else ()))
        if spec.quantized:
            k_layer, v_layer, ks_layer, vs_layer = new_cache
        else:
            k_layer, v_layer = new_cache
        kv_layout = "bhsd" if spec.head_major else "bshd"
        if sp_mode in ("cso", "ulysses"):
            # in-forward CP (reference cp-strategy dispatch ulysses/cso,
            # dit_module.py:1087-1195): "cso" pipelines per-chunk
            # a2a->attend->a2a chains, "ulysses" moves the whole window in
            # one a2a pair; both live in a shard_map island while
            # everything around stays GSPMD-sharded
            from ...parallel.distributed_attention import cso_chunk_attention

            qc = q.reshape(b, n_chunks, ct, nh, hd)
            core = cso_chunk_attention(
                mesh, qc, k_layer, v_layer, token_ranges,
                jnp.asarray(current_end, jnp.int32),
                k_scales=ks_layer if spec.quantized else None,
                v_scales=vs_layer if spec.quantized else None,
                whole_window=sp_mode == "ulysses",
                kv_layout=kv_layout,
            ).reshape(b, n_chunks * ct, nh, hd)
        else:
            use_pallas = jax.default_backend() == "tpu"
            outs = []
            for ci in range(n_chunks):
                qi = q[:, ci * ct:(ci + 1) * ct]
                span = token_ranges[ci]
                ms = (int(static_kv_spans[ci]) * ct
                      if static_kv_spans is not None else None)
                if use_pallas and spec.quantized:
                    # int8-KV span kernel: column-scaling dequant runs at the
                    # bf16 kernel's rate (157 vs 78 TF/s for the e4m3
                    # cast-only cache at the 4.5B window shape,
                    # exp/r4_magi_attn.py)
                    from ...ops.flash_attention import (
                        flash_attention_gqa_quant)

                    outs.append(flash_attention_gqa_quant(
                        qi, k_layer, v_layer, ks_layer, vs_layer,
                        kv_len=jnp.minimum(span[1], current_end),
                        kv_start=span[0],
                        max_span=ms,
                        kv_layout=kv_layout,
                    ))
                elif use_pallas:
                    from ...ops.flash_attention import flash_attention_gqa

                    outs.append(flash_attention_gqa(
                        qi, k_layer, v_layer,
                        kv_len=jnp.minimum(span[1], current_end),
                        kv_start=span[0],
                        max_span=ms,
                        kv_layout=kv_layout,
                    ))
                else:
                    if spec.quantized:
                        kd = (k_layer.astype(jnp.float32)
                              * ks_layer[..., None]).astype(h_x.dtype)
                        vd = (v_layer.astype(jnp.float32)
                              * vs_layer[..., None]).astype(h_x.dtype)
                    else:
                        kd, vd = k_layer, v_layer
                    if spec.head_major:
                        # XLA fallback takes token-major (CPU tests)
                        kd = jnp.swapaxes(kd, 1, 2)
                        vd = jnp.swapaxes(vd, 1, 2)
                    kc = jnp.repeat(kd, rep, axis=2)
                    vc = jnp.repeat(vd, rep, axis=2)
                    idx = jnp.arange(spec.slots, dtype=jnp.int32)
                    mask = (idx >= span[0]) & (idx < jnp.minimum(span[1],
                                                                 current_end))
                    outs.append(cache_attention(qi, kc, vc, kv_mask=mask,
                                                logical_kv=spec.max_tokens))
            core = jnp.concatenate(outs, axis=1)       # [B, S, nh, hd]

    # --- cross attention (parallel branch, same ln input) ---
    qx = magi_linear(blk["qx"], ln).reshape(b, -1, nh, hd)
    qx = _ln(blk["qx_ln"], qx.astype(jnp.float32), eps).astype(h_x.dtype)
    # caption K/V: [.., 2*kv_dim] laid out group-major [g0_k|g0_v|g1_k|...]
    kv_y = magi_linear(blk["kv_xattn"], y)             # [B, nc, L, 2*kv_dim]
    cap_len = y.shape[2]
    kv_y = kv_y.reshape(b, n_chunks, cap_len, nkv, 2 * hd)
    yk = kv_y[..., :hd]
    yv = kv_y[..., hd:]
    yk = _ln(blk["kx_ln"], yk.astype(jnp.float32), eps).astype(h_x.dtype)
    yv = yv.astype(h_x.dtype)
    cq = qx.reshape(b, n_chunks, ct, nh, hd).reshape(b * n_chunks, ct, nh, hd)
    cmask = caption_mask.reshape(b * n_chunks, cap_len) > 0
    xa = _xattn_attend(cq, yk.reshape(b * n_chunks, cap_len, nkv, hd),
                       yv.reshape(b * n_chunks, cap_len, nkv, hd),
                       cmask, rep,
                       use_gqa=jax.default_backend() == "tpu",
                       mesh=island_mesh)
    xatt = xa.reshape(b, n_chunks * ct, nh, hd)

    # --- joint projection with (n=2, hn=nkv) group interleave
    #     (attn_linear_proj, dit_module.py:1283-1298) ---
    core_g = core.reshape(b, -1, nkv, rep * hd)
    xatt_g = xatt.reshape(b, -1, nkv, rep * hd)
    cat = jnp.stack([core_g, xatt_g], axis=3)          # [B, S, nkv, 2, rep*hd]
    cat = cat.reshape(b, -1, 2 * nkv * rep * hd)
    h1 = magi_linear(blk["proj"], cat.astype(jnp.float32)
                     if "w" in blk["proj"] else cat.astype(h_x.dtype))

    # --- gating + post-norm residuals (gating_and_mlp) ---
    gates = _softcap(magi_linear(
        blk["ada_proj"], jax.nn.silu(cond.astype(jnp.float32))), 1.0)
    g_msa, g_mlp = gates[..., :cfg.hidden_size], gates[..., cfg.hidden_size:]

    def bias_modulate_add(xv, res, gate, post_norm):
        xf = xv.astype(jnp.float32).reshape(b, n_chunks, ct, -1)
        xf = xf * gate[:, :, None, :]
        xf = xf.reshape(b, n_chunks * ct, -1)
        xf = _ln(post_norm, xf, eps)
        return (xf + res.astype(jnp.float32)).astype(h_x.dtype)

    h_x = bias_modulate_add(h1, residual, g_msa, blk["self_post_norm"])

    residual = h_x
    mlp_in = _ln(blk["mlp_ln"], h_x, eps).astype(h_x.dtype)
    if "fc1_up" in blk:
        # gate/up-SEPARATE tensor layout (split_gated_fc1): both matmuls and
        # the silu*mul are tp-shard-local. The concatenated [gate|up] layout
        # slices a tp-sharded dim, which makes GSPMD insert cross-shard
        # collective-permutes — inside the partially-manual pp body those
        # deadlock the pp ppermute rendezvous (measured, r17 bisect), and
        # even at pp=1 they are wasted wire. Required for the composed
        # tp x pp 24B deployments; identical math to the concat layout.
        gate = magi_linear(blk["fc1"], mlp_in)
        up = magi_linear(blk["fc1_up"], mlp_in)
        act = (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)
        ff = magi_linear(blk["fc2"], act)
        h_x = bias_modulate_add(ff, residual, g_mlp, blk["mlp_post_norm"])
        return h_x, new_cache
    ff_in = magi_linear(blk["fc1"], mlp_in)
    act_name = "silu_mul" if cfg.gated_linear_unit else "gelu_exact"
    if "w_q" in blk["fc2"] and blk["fc2"]["w_q"].dtype == jnp.int8:
        # activation folded into fc2's quant pass (one Pallas read of the
        # [tokens, ffn(x2)] tensor when the fused kernel is on; exact XLA
        # chain otherwise — quant.api.apply_act)
        ff = magi_int8_linear(blk["fc2"], ff_in, act=act_name)
    else:
        if cfg.gated_linear_unit:
            # 24B SwiGLU (CustomMLP + flashinfer silu_and_mul,
            # dit_module.py:528-553): fc1 -> 2*ffn, silu(gate) * up
            d = cfg.ffn_hidden_size
            act = (jax.nn.silu(ff_in[..., :d].astype(jnp.float32))
                   .astype(ff_in.dtype) * ff_in[..., d:])
        else:
            act = jax.nn.gelu(ff_in, approximate=False)
        ff = magi_linear(blk["fc2"], act)
    h_x = bias_modulate_add(ff, residual, g_mlp, blk["mlp_post_norm"])
    return h_x, new_cache


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _timestep_embedding_256(t: jax.Array) -> jax.Array:
    """Reference TimestepEmbedder.timestep_embedding (dim 256, rescale 1000,
    [cos | sin] layout, dit_module.py:75-95)."""
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _embed_window_inputs(
    params: Params,
    statics: MagiStatics,
    x_window: jax.Array,
    t: jax.Array,
    captions: jax.Array,
    slice_point: jax.Array,
    caption_dropout: Optional[jax.Array],
    distill_dt_factor: Optional[float],
):
    """Shared embedding front-end: patch tokens, AdaLN condition vector
    (t-embed + per-row null-caption adaln token), projected captions, and
    the window's rope angles. caption_dropout [B] bool selects the adaln
    single-token per row (reference `caption_drop_single_token`,
    dit_module.py:141-148: null_caption_embedding[-1] when dropped/uncond,
    [-2] when conditional)."""
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b, n_chunks = t.shape
    ct = geo.chunk_tokens

    # input pre-process (forward_pre_process, dit_model.py:269-272):
    # x_rescale on the way IN (undone on the way out), and half-channel
    # latents duplicated up to the model's in_channels
    if cfg.x_rescale_factor != 1.0:
        x_window = x_window * cfg.x_rescale_factor
    if cfg.half_channel_vae:
        assert x_window.shape[-1] == 16
        x_window = jnp.concatenate([x_window, x_window], axis=-1)
    tokens = magi_linear(params["x_embedder"],
                         _patchify(cfg, geo, x_window))
    temb = _timestep_embedding_256(t)
    te = params["t_embedder"]
    cvec = magi_linear(te["fc2"], jax.nn.silu(magi_linear(te["fc1"], temb)))
    if distill_dt_factor is not None:
        # distilled checkpoints add t_embedder(distill_dt) to the condition
        # (dit_model.py:175-185: dt = num_steps/4*2, or 4/interval*2 for the
        # 12-step shortcut schedule)
        dt = jnp.full_like(t, distill_dt_factor)
        demb = _timestep_embedding_256(dt)
        cvec = cvec + magi_linear(te["fc2"],
                                  jax.nn.silu(magi_linear(te["fc1"], demb)))
    ye = params["y_embedder"]
    null_cond = ye["null_caption_embedding"][-2].astype(jnp.float32)
    null_drop = ye["null_caption_embedding"][-1].astype(jnp.float32)
    if caption_dropout is None:
        tok = jnp.broadcast_to(null_cond[None], (b, null_cond.shape[0]))
    else:
        tok = jnp.where(caption_dropout[:, None], null_drop[None],
                        null_cond[None])
    y_adaln = magi_linear(ye["y_proj_adaln"], tok)          # [B, cond_dim]
    cond = (cvec + y_adaln[:, None, :]).astype(jnp.float32)
    y = jax.nn.silu(magi_linear(ye["y_proj_xattn"],
                                captions.astype(tokens.dtype)))

    # learned rope over the full temporal extent; take the window's tail.
    # max_pos bounds the table like the reference's T_total
    max_t = (spec.max_tokens // geo.frame_seq)
    full_angles = magi_rope_angles(params["rope_bands"], max_t, geo.grid_h,
                                   geo.grid_w)
    start_tok = slice_point * ct
    angles = jax.lax.dynamic_slice_in_dim(
        full_angles, start_tok, n_chunks * ct, 0)
    return tokens, cond, y, angles


def sync_cache_rows(spec: KVCacheSpec, cache: KVCache, start: jax.Array,
                    length: int, src_row: int = 1, dst_row: int = 0
                    ) -> KVCache:
    """Copy the token span [start, start+length) of batch row `src_row` into
    `dst_row` for every layer/field. Reference 3-CFG cache semantics: only
    the cond_pre (no-text) forward persists KV (`forward_3cfg`,
    dit_model.py:412-434 update_kv_cache False/True) — on TPU both rows of
    the batched forward write their own KV for in-window attention, then the
    cond row's span is overwritten with the uncond-text row's so every later
    window attends the reference's cache content."""
    # token axis of [L, B, S, H(, D)] is 2; head-major [L, B, H, S(, D)] -> 3
    seq_ax = 3 if spec.head_major else 2

    def _sync(f):
        if f is None:
            return None
        src = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_index_in_dim(f, src_row, 1, keepdims=True),
            start, length, seq_ax)
        idx = [jnp.int32(0)] * f.ndim
        idx[1] = jnp.int32(dst_row)
        idx[seq_ax] = start
        return jax.lax.dynamic_update_slice(f, src.astype(f.dtype),
                                            tuple(idx))
    return KVCache(*(_sync(f) for f in cache))


def magi_forward(
    params: Params,
    statics: MagiStatics,
    rope_tables: Optional[RopeTables],   # unused (learned bands in params)
    x_window: jax.Array,     # [B, n_chunks*chunk_width, H, W, C] latents
    t: jax.Array,            # [B, n_chunks] in [0, 1] (0=noise, 1=clean)
    captions: jax.Array,     # [B, n_chunks, cap_len, cap_dim]
    caption_mask: jax.Array,  # [B, n_chunks, cap_len]
    cache: KVCache,
    slice_point: jax.Array,  # scalar int32: chunk index of window chunk 0
    kv_ranges: jax.Array,    # [n_chunks, 2] int32 chunk-range [start, end)/chunk
    max_chunks: Optional[int] = None,
    distill_dt_factor: Optional[float] = None,
    caption_dropout: Optional[jax.Array] = None,  # [B] bool
    sync_kv_rows: bool = False,
    static_kv_spans: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, KVCache]:
    """One window forward. All window chunks' KV is written into the cache at
    their logical positions; chunk i attends to token span
    [kv_ranges[i,0]*chunk_tokens, kv_ranges[i,1]*chunk_tokens). Returns
    (velocity [B, n_chunks*cw, H, W, out], updated cache).

    sync_kv_rows=True (3-CFG batched cond+text / cond_pre forward): after the
    layer stack, row 1's freshly written span overwrites row 0's — see
    `sync_cache_rows`.

    static_kv_spans (static when jitted): per-chunk span widths in chunks,
    host-known upper bounds on kv_ranges[:,1]-kv_ranges[:,0] — activates
    the span-sized attention grid (see _magi_layer). Distinct tuples
    recompile; the walk keeps the set bounded (exact widths under
    noise2clean caps ~2x window variants, pow2 buckets otherwise)."""
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_window.shape[0]
    n_chunks = t.shape[1]
    cw, ct = geo.chunk_width, geo.chunk_tokens
    eps = cfg.layernorm_epsilon

    tokens, cond, y, angles = _embed_window_inputs(
        params, statics, x_window, t, captions, slice_point,
        caption_dropout, distill_dt_factor)

    current_start = slice_point * ct
    current_end = current_start + n_chunks * ct
    token_ranges = kv_ranges * ct  # [n_chunks, 2]

    cache_fields = tuple(
        f for f in (cache.k, cache.v, cache.k_scale, cache.v_scale)
        if f is not None)

    def layer(carry, xs):
        h_x, fields = carry
        blk, lid = xs
        layer_cache = tuple(
            jax.lax.dynamic_index_in_dim(f, lid, 0, keepdims=False)
            for f in fields)
        h_x, new_layer_cache = _magi_layer(
            blk, h_x, cond, y, caption_mask, layer_cache,
            cfg=cfg, spec=spec, n_chunks=n_chunks, ct=ct, angles=angles,
            token_ranges=token_ranges, current_start=current_start,
            current_end=current_end, mesh=statics.mesh,
            sp_mode=statics.sp_mode, static_kv_spans=static_kv_spans,
        )
        fields = tuple(
            jax.lax.dynamic_update_index_in_dim(f, nf.astype(f.dtype),
                                                lid, 0)
            for f, nf in zip(fields, new_layer_cache))
        return (h_x, fields), None

    if "blocks" in params:
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (h_x, new_fields), _ = jax.lax.scan(
            layer, (tokens, cache_fields), (params["blocks"], layer_ids)
        )
    else:
        # fp8 distill-quant layout: first/last layers bf16, middle stacked
        (h_x, new_fields), _ = layer(
            (tokens, cache_fields),
            (params["blocks_first"], jnp.int32(0)))
        mid_ids = jnp.arange(1, cfg.num_layers - 1, dtype=jnp.int32)
        (h_x, new_fields), _ = jax.lax.scan(
            layer, (h_x, new_fields), (params["blocks_mid"], mid_ids))
        (h_x, new_fields), _ = layer(
            (h_x, new_fields),
            (params["blocks_last"], jnp.int32(cfg.num_layers - 1)))
    new_k, new_v = new_fields[0], new_fields[1]
    new_scales = new_fields[2:] if spec.quantized else (None, None)

    # final layer norm (TransformerBlock post_process) + plain linear, fp32
    h_out = _ln(params["final_layernorm"], h_x.astype(jnp.float32), eps)
    out = magi_linear(params["final_linear"], h_out)
    velocity = _postprocess_velocity(cfg, geo, out, n_chunks * cw)
    if spec.quantized:
        new_cache = KVCache(k=new_k, v=new_v, k_scale=new_scales[0],
                            v_scale=new_scales[1])
    else:
        new_cache = KVCache(k=new_k, v=new_v)
    if sync_kv_rows:
        assert b == 2, "sync_kv_rows is the 3-CFG batched-forward contract"
        new_cache = sync_cache_rows(spec, new_cache, current_start,
                                    n_chunks * ct)
    return velocity, new_cache


def magi_forward_window_scan(
    params: Params,
    statics: MagiStatics,
    rope_tables: Optional[RopeTables],
    x_window: jax.Array,     # [B, n_chunks*chunk_width, H, W, C]
    t: jax.Array,            # [B, n_chunks]
    captions: jax.Array,     # [B, n_chunks, cap_len, cap_dim]
    caption_mask: jax.Array,
    cache: KVCache,
    slice_point: jax.Array,
    kv_ranges: jax.Array,    # [n_chunks, 2]
    caption_dropout: Optional[jax.Array] = None,
    distill_dt_factor: Optional[float] = None,
    static_kv_spans: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, KVCache]:
    """Per-chunk window dispatch as ONE jitted program: a `lax.scan` over
    the window's chunks with the cache as carry.

    Same math as the host-side per-chunk loop (`MagiRuntimeConfig.
    window_dispatch="per_chunk"`: chunk i's kv_range covers only chunks
    <= i, whose KV earlier iterations wrote) and the same memory property
    — XLA sizes a scan's temp at the MAX over iterations, so the live set
    stays one chunk, the 24B fit lever. What it removes is the per-chunk
    fixed overhead the L4 control measured (~0.36 s/forward at 4 chunks:
    4 dispatch boundaries + the host loop between them). One compromise:
    `static_kv_spans` must be uniform across scan iterations, so the grid
    uses the window's MAX span for every chunk (a few dead grid steps on
    early chunks vs per_chunk's exact spans — the A/B decides the default).

    sync_kv_rows is intentionally absent: like the per-chunk loop, the
    caller syncs the whole window span once afterwards."""
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_window.shape[0]
    n_chunks = t.shape[1]
    cw = geo.chunk_width
    span = None
    if static_kv_spans is not None:
        span = (max(int(s) for s in static_kv_spans),)

    # [B, n_chunks*cw, ...] -> scan xs with leading n_chunks
    xs = {
        "x": x_window.reshape(b, n_chunks, cw, *x_window.shape[2:])
             .swapaxes(0, 1),                       # [nc, B, cw, H, W, C]
        "t": t.swapaxes(0, 1)[:, :, None],          # [nc, B, 1]
        "caps": captions.swapaxes(0, 1)[:, :, None],  # [nc, B, 1, L, D]
        "mask": caption_mask.swapaxes(0, 1)[:, :, None],
        "kvr": kv_ranges[:, None],                  # [nc, 1, 2]
        "ci": jnp.arange(n_chunks, dtype=jnp.int32),
    }

    def step(cache_c, x):
        vel, cache_c = magi_forward(
            params, statics, rope_tables,
            x_window=x["x"], t=x["t"], captions=x["caps"],
            caption_mask=x["mask"], cache=cache_c,
            slice_point=slice_point + x["ci"], kv_ranges=x["kvr"],
            caption_dropout=caption_dropout,
            distill_dt_factor=distill_dt_factor,
            sync_kv_rows=False, static_kv_spans=span,
        )
        return cache_c, vel

    cache, vels = jax.lax.scan(step, cache, xs)
    # [nc, B, cw, H, W, out] -> [B, nc*cw, H, W, out]
    velocity = vels.swapaxes(0, 1).reshape(
        b, n_chunks * cw, *vels.shape[3:])
    return velocity, cache


def magi_forward_uncond(
    params: Params,
    statics: MagiStatics,
    x_chunks: jax.Array,      # [n_den, chunk_width, H, W, C] per-chunk rows
    t: jax.Array,             # [n_den, 1]
    captions: jax.Array,      # [n_den, 1, cap_len, cap_dim] (null caption)
    caption_mask: jax.Array,  # [n_den, 1, cap_len]
    distill_dt_factor: Optional[float] = None,
) -> jax.Array:
    """The 3-CFG third forward (reference forward_3cfg UnconditionGuard,
    dit_model.py:446-492): every denoising chunk becomes its own batch row,
    attends ONLY to itself (generate_kv_range_for_uncondition — no prefix
    KV, no cache read or write), rope restarts at position 0
    (slice_point=0), and the caption is dropped (adaln null token -1).
    Returns velocity [n_den, chunk_width, H, W, out]."""
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_chunks.shape[0]
    cw, ct = geo.chunk_width, geo.chunk_tokens
    eps = cfg.layernorm_epsilon

    tokens, cond, y, angles = _embed_window_inputs(
        params, statics, x_chunks, t, captions, jnp.int32(0),
        jnp.ones((b,), bool), distill_dt_factor)

    def layer(h_x, blk):
        h_x, _ = _magi_layer(
            blk, h_x, cond, y, caption_mask, None,
            cfg=cfg, spec=spec, n_chunks=1, ct=ct, angles=angles,
            token_ranges=None, current_start=None, current_end=None,
            mesh=statics.mesh, sp_mode=statics.sp_mode,
        )
        return h_x, None

    if "blocks" in params:
        h_x, _ = jax.lax.scan(layer, tokens, params["blocks"])
    else:
        h_x, _ = layer(tokens, params["blocks_first"])
        h_x, _ = jax.lax.scan(layer, h_x, params["blocks_mid"])
        h_x, _ = layer(h_x, params["blocks_last"])
    h_out = _ln(params["final_layernorm"], h_x.astype(jnp.float32), eps)
    out = magi_linear(params["final_linear"], h_out)
    return _postprocess_velocity(cfg, geo, out, cw)


def magi_forward_pp(
    params: Params,
    statics: MagiStatics,
    rope_tables: Optional[RopeTables],
    x_window: jax.Array,
    t: jax.Array,
    captions: jax.Array,
    caption_mask: jax.Array,
    cache: KVCache,
    slice_point: jax.Array,
    kv_ranges: jax.Array,
    caption_dropout: Optional[jax.Array] = None,
    sync_kv_rows: bool = False,
    distill_dt_factor: Optional[float] = None,
    static_kv_spans: Optional[Tuple[int, ...]] = None,
    *,
    mesh,
) -> Tuple[jax.Array, KVCache]:
    """Pipeline-parallel MAGI window forward: same contract as
    `magi_forward`, but the layer stack runs through the microbatched
    GPipe pipeline (`parallel/pipeline_parallel.py:pp_pipeline`) with the
    stacked layer axis (params AND KV cache) sharded over the mesh's `pp`
    axis. Microbatches are the batch rows — for the 2-row CFG batch the
    cond/uncond halves occupy consecutive stages, the TPU analog of the
    reference's work queue keeping PP stages busy
    (`inferix/pipeline/magi/video_generate.py:723-756`).

    Embeddings and the output head are small and run outside the pipeline
    (replicated); all layer FLOPs are stage-local. Requires the uniform
    (non-fp8-split) "blocks" layout.
    """
    from ...parallel.pipeline_parallel import pp_pipeline

    assert "blocks" in params, "pp path requires the uniform blocks layout"
    cfg, spec, geo = statics.cfg, statics.spec, statics.geo
    b = x_window.shape[0]
    n_chunks = t.shape[1]
    cw, ct = geo.chunk_width, geo.chunk_tokens
    eps = cfg.layernorm_epsilon
    # composed deployment (the 24B per-chunk AOT table: tp4 x pp2 /
    # tp2 x sp2 x pp2): the pipeline runs partially manual (pp only) so the
    # stage matmuls stay GSPMD tensor-sharded over tp and the attention runs
    # in nested (tp, sp) islands inside the stage body
    compose = (mesh.shape.get("tp", 1) > 1 or mesh.shape.get("sp", 1) > 1)
    sp_mode = statics.sp_mode if compose else "none"
    quantized = spec.quantized
    if quantized and not compose:
        raise NotImplementedError(
            "quantized MAGI KV cache through the fully-manual pp pipeline "
            "is not wired (use a tp/sp>1 mesh — composed mode — or "
            "quantize_kv=False)")

    # batch rows (the cond/uncond CFG halves) are the microbatches
    tokens, cond, y, angles = _embed_window_inputs(
        params, statics, x_window, t, captions, slice_point,
        caption_dropout, distill_dt_factor)
    current_start = slice_point * ct
    current_end = current_start + n_chunks * ct
    token_ranges = kv_ranges * ct

    microbatches = {
        "h": tokens[:, None],
        "cond": cond[:, None],
        "y": y[:, None],
        "cmask": caption_mask[:, None],
    }
    layer_state = {"k": cache.k, "v": cache.v}
    if quantized:
        layer_state["ks"] = cache.k_scale
        layer_state["vs"] = cache.v_scale

    def layer_fn(blk, state, x, mb_idx):
        rows = tuple(
            jax.lax.dynamic_slice_in_dim(state[f], mb_idx, 1, 0)
            for f in (("k", "v", "ks", "vs") if quantized else ("k", "v")))
        h_new, new_rows = _magi_layer(
            blk, x["h"], x["cond"], x["y"], x["cmask"], rows,
            cfg=cfg, spec=spec, n_chunks=n_chunks, ct=ct, angles=angles,
            token_ranges=token_ranges, current_start=current_start,
            current_end=current_end, static_kv_spans=static_kv_spans,
            mesh=mesh if compose else None, sp_mode=sp_mode,
        )
        new_state = {
            f: jax.lax.dynamic_update_slice_in_dim(
                state[f], r.astype(state[f].dtype), mb_idx, 0)
            for f, r in zip(
                ("k", "v", "ks", "vs") if quantized else ("k", "v"),
                new_rows)
        }
        return {**x, "h": h_new}, new_state

    outs, new_state = pp_pipeline(
        mesh, layer_fn, params["blocks"], microbatches,
        layer_state=layer_state, pass_mb_index=True,
        compose_auto=compose,
    )
    h_x = outs["h"][:, 0]

    h_out = _ln(params["final_layernorm"], h_x.astype(jnp.float32), eps)
    out = magi_linear(params["final_linear"], h_out)
    velocity = _postprocess_velocity(cfg, geo, out, n_chunks * cw)
    new_cache = KVCache(k=new_state["k"], v=new_state["v"],
                        k_scale=new_state.get("ks"),
                        v_scale=new_state.get("vs"))
    if sync_kv_rows:
        assert b == 2, "sync_kv_rows is the 3-CFG batched-forward contract"
        new_cache = sync_cache_rows(spec, new_cache, current_start,
                                    n_chunks * ct)
    return velocity, new_cache
