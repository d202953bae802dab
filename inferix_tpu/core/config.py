"""Unified configuration for the TPU engine.

The reference splits configuration across three systems (OmegaConf YAML for
Wan-family, JSON dataclasses for MAGI, argparse per example —
`inferix/core/config/model.py:22-107`, `inferix/models/magi/config/magi_config.py`).
Here there is one dataclass tree, loadable from dict / JSON / YAML.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .types import DecodeMode, MemoryMode, StreamingMode


@dataclasses.dataclass
class ModelConfig:
    """Architecture hyperparameters of the causal DiT backbone.

    Defaults are the Wan2.1-T2V-1.3B shapes used by Self-Forcing/CausVid
    (reference: `inferix/pipeline/self_forcing/CausalInferencePipeline.py:92-93`,
    30 layers / 1560 tokens per latent frame).
    """

    model_type: str = "t2v"  # "t2v" | "i2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    local_attn_size: int = -1  # frames; -1 = global window (cache cap applies)
    sink_size: int = 0         # frames pinned at the start of the rolling cache
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    rope_max_seq_len: int = 1024

    # Fuse the self-attention q/k/v projections into one [D, 3D] matmul at
    # generator init (numerically identical; one MXU dispatch instead of
    # three — measured ~3% of layer linear+elementwise time on v5e).
    # Disabled automatically under tensor parallelism (tp>1 keeps separate
    # head-sharded projections).
    fuse_qkv: bool = True
    # Unroll the layer loop instead of lax.scan: static per-layer slices let
    # XLA treat leading-axis slicing/updating of the KV cache as pointer
    # arithmetic (no per-layer extract/write-back copies), at the cost of a
    # ~30x larger graph and slower compiles. Perf experiment flag.
    unroll_layers: bool = False
    # Semi-AR structure
    num_frame_per_block: int = 3
    independent_first_frame: bool = False
    # Max tokens the self-attention KV cache holds. The reference caps at
    # 32760 (= 21 frames x 1560 tokens) or local_attn_size frames
    # (`causal_model.py:122`).
    max_attention_frames: int = 21

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads

    def frame_seq_length(self, latent_h: int, latent_w: int) -> int:
        ph, pw = self.patch_size[1], self.patch_size[2]
        return (latent_h // ph) * (latent_w // pw)

    @property
    def attention_window_frames(self) -> int:
        if self.local_attn_size == -1:
            return self.max_attention_frames
        return self.local_attn_size


@dataclasses.dataclass
class ParallelConfig:
    """Mesh layout. One `jax.sharding.Mesh` replaces the reference's three
    process-group stacks (parallel_state + xfuser + yunchang,
    `inferix/distributed/parallel_state.py`, `models/self_forcing/wrapper.py:191-206`).
    """

    dp: int = 1      # data parallel (requests / batch)
    sp: int = 1      # sequence parallel (tokens within a frame's HW)
    tp: int = 1      # tensor parallel (heads / ffn hidden)
    pp: int = 1      # pipeline stages (layer ranges)
    sp_mode: str = "ulysses"  # "ulysses" | "ring"/"ring_pass_q" | "ring_pass_kv" | "auto"

    @property
    def world_size(self) -> int:
        return self.dp * self.sp * self.tp * self.pp

    def axis_sizes(self) -> Dict[str, int]:
        return {"dp": self.dp, "sp": self.sp, "tp": self.tp, "pp": self.pp}


@dataclasses.dataclass
class QuantConfig:
    """Quantization recipe (replaces the external DAX library + MAGI fp8 flags,
    reference `example/quantization/run_self_forcing_quantized.py:33-65`,
    `inferix/models/magi/dit/dit_module.py:367-490`)."""

    enabled: bool = False
    dtype: str = "int8"            # "int8" | "fp8" (e4m3)
    granularity: str = "per_channel"  # "per_tensor" | "per_channel" (per-token act x per-channel weight)
    quantize_kv_cache: bool = False
    kv_cache_dtype: str = "int8"
    # module-name substrings excluded from quantization (reference excludes
    # text_embedding / proj_out / head and first/last layer qkv)
    exclude: Tuple[str, ...] = ("text_embedding", "head", "patch_embedding", "time_")
    first_last_layer_excluded: bool = True
    # Fused one-pass activation quantization (Pallas, ops/act_quant.py):
    # quantize each int8 linear's input in a single read->s8 pass and fold
    # the FFN gelu into fc2's quant, instead of XLA's multi-pass chain
    # (~16 ms/forward at the 1.3B fc2 input, exp/r6_results/
    # op_breakdown.log). Numerics: quant codes within +-1 where the gelu is
    # folded (f32 vs bf16 tanh rounding), exact elsewhere. Default OFF
    # pending the engine A/B (exp/r10_act_quant.py); flip after measuring.
    fused_act_quant: bool = False


@dataclasses.dataclass
class RuntimeConfig:
    """Execution-time knobs."""

    dtype: str = "bfloat16"
    seed: int = 42
    denoising_step_list: Tuple[int, ...] = (1000, 750, 500, 250)
    warp_denoising_step: bool = True
    context_noise: int = 0
    # How the KV cache gets its persistent "context" for later blocks:
    #   "rerun"     — extra forward on clean x0 at t=context_noise (reference
    #                 semantics, `CausalInferencePipeline.py:348-361`)
    #   "last_step" — persist the KV written during the FINAL denoise step
    #                 (input renoised at denoising_step_list[-1]); skips the
    #                 re-run forward entirely: 4 forwards/block instead of 5
    #                 (+29% measured), at a measurable context-quality cost.
    context_mode: str = "rerun"
    timestep_shift: float = 8.0
    guidance_scale: float = 0.0
    decode_mode: DecodeMode = DecodeMode.AFTER_ALL
    streaming_mode: StreamingMode = StreamingMode.AUTO
    memory_mode: MemoryMode = MemoryMode.RELAXED
    vae_chunk_size: int = 2
    free_cache_before_vae: bool = True
    # VAE conv implementation for the decode path: "xla" (lossless default)
    # | "halo" (lossless Pallas, measured a wash at whole-decode) |
    # "halo_w8a8" (int8-conv serving mode: -28% decode, 545.7 vs 757.5
    # ms/chunk at 480x832 — LOSSY, gated by QUALITY_r05's w8a8_decode
    # delta). Pipelines apply it at init (trace-time static).
    vae_conv_impl: str = "xla"
    # Streaming segments
    frames_per_segment: int = 21
    overlap_frames: int = 3
    # Latent geometry (1.3B @ 480x832 -> [21, 16, 60, 104])
    num_frames: int = 21
    latent_channels: int = 16
    latent_height: int = 60
    latent_width: int = 104
    batch_size: int = 1
    # Span-sized attention grids (TPU): pass a power-of-two-bucketed host
    # bound on the live cache prefix per block so early blocks' Pallas
    # kernels stop stepping over the whole padded cache (dead-grid-step
    # suspect, exp/r5_span_grid.py). Costs one extra compile per bucket
    # (~log2(num_blocks), persistently cached). Default ON [r5]: once
    # max-size buckets fold to the default program (span_bucket) the
    # round-4 "-1.9% clip throughput" cost — which came from a max_span==
    # cache_size TWIN program at steady state — disappears, and two clean
    # A/B runs measure True at +1.4..1.9% clip f/s AND -5..9% TTFB vs off
    # (exp/r6_results/q6_span_ttfb*.log). "ttfb" buckets only while the
    # bound is <= half the cache (early blocks only) — a middle setting
    # retained for deployments that want zero in-clip program switching.
    span_grid: bool | str = True
    # Head-major KV cache layout [L, B, H, S, D] (KVCacheSpec.head_major):
    # makes the flash kernels' [B*H, S, D] operand fold a free reshape
    # instead of a per-layer full-cache transpose copy, at the price of a
    # small transpose of each written block. Composes with the sp islands
    # (ulysses/ring cache pspecs move with the head axis). Default OFF
    # until the A/B (exp/r7_cache_layout.py) is confirmed on hardware;
    # flip after measuring.
    kv_head_major: bool = False
    # Pad-free cache allocation: round the PHYSICAL cache slot count up to
    # a multiple of the flash kernel's kv_block so the kernel's per-layer
    # K/V pads (2 x 100 MB rewrites/layer at the 1.3B full-cache shape,
    # ~9 ms/forward in the round-3 trace — exp/r6_results/op_breakdown.log
    # %pad.83/84) become no-ops. Slot arithmetic stays on the logical
    # window, the extra rows are never written or attended, and generation
    # is bit-equal (tests; the XLA fallback slices back to the logical
    # window — cache_attention(logical_kv=...) — so even CPU runs are
    # exact; the sp-island CPU fallbacks don't slice, so sp x alloc-pad
    # on CPU meshes may differ from the exact-size run at reduction-order
    # level only). TPU kernels are exact at production shapes (logical
    # window >= the 2048-token kv_block): there the padded and exact
    # allocations tile identically. A logical window SMALLER than kv_block
    # may tile differently when padded (the kernel sizes its kv grid from
    # the physical S), allowing reduction-order-level drift on TPU too.
    # Default OFF until the e2e A/B (exp/r8_alloc_pad.py) confirms a >1%
    # win on hardware; flip after measuring.
    kv_alloc_pad: bool = False
    # Rope via a constant +-1 rotation matmul (ops/rope.py set_rope_impl
    # "mxu") instead of the interleaved-pair reshape whose [.., D//2, 2]
    # tensors XLA lays out as T(2,128). Same arithmetic term for term (the
    # matmul extracts partner lanes exactly; parity-tested to 1e-6).
    # Default ON [r4]: the donated-forward A/B measured 247.8 ms vs the
    # 259.8 ms baseline (-4.6%, exp/r6_results/r10_rope.log) — far past
    # the >1% flip rule; the win exceeds the ~3 ms the trace attributed to
    # the pair-interleave (%subtract_convert_fusion.3) because the
    # T(2,128) layouts also poisoned neighboring fusions.
    rope_mxu: bool = True


@dataclasses.dataclass
class EngineConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    model_path: Optional[str] = None
    profile: bool = False

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "EngineConfig":
        def build(klass, sub):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in (sub or {}).items():
                if k not in fields:
                    raise KeyError(f"Unknown config key {k!r} for {klass.__name__}")
                ftype = fields[k].type
                if isinstance(v, list):
                    v = tuple(v)
                if k == "decode_mode":
                    v = DecodeMode(v)
                elif k == "streaming_mode":
                    v = StreamingMode(v)
                elif k == "memory_mode":
                    v = MemoryMode(v)
                kwargs[k] = v
            return klass(**kwargs)

        return cls(
            model=build(ModelConfig, d.get("model")),
            parallel=build(ParallelConfig, d.get("parallel")),
            quant=build(QuantConfig, d.get("quant")),
            runtime=build(RuntimeConfig, d.get("runtime")),
            model_path=d.get("model_path"),
            profile=bool(d.get("profile", False)),
        )

    @classmethod
    def from_json(cls, path: str | pathlib.Path) -> "EngineConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        import enum

        d = dataclasses.asdict(self)

        def clean(v):
            if isinstance(v, enum.Enum):
                return v.value
            if isinstance(v, dict):
                return {k: clean(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [clean(x) for x in v]
            return v

        return clean(d)


def tiny_test_config() -> EngineConfig:
    """Small shapes for unit tests (the reference's `tests/configs/` pattern:
    5 frames, 64x64)."""
    cfg = EngineConfig()
    cfg.model = ModelConfig(
        dim=128,
        ffn_dim=256,
        num_heads=4,
        num_layers=2,
        freq_dim=32,
        text_dim=64,
        text_len=16,
        num_frame_per_block=1,
        max_attention_frames=6,
        rope_max_seq_len=64,
    )
    cfg.runtime = RuntimeConfig(
        num_frames=5,
        latent_channels=16,
        latent_height=8,
        latent_width=8,
        denoising_step_list=(1000, 500),
        frames_per_segment=4,
        overlap_frames=1,
    )
    return cfg
