"""inferix_tpu — TPU-native semi-autoregressive video inference engine.

Public API surface (lazy imports keep `import inferix_tpu` light):

    from inferix_tpu import (
        EngineConfig, DecodeMode, StreamingMode,
        SelfForcingPipeline, CausVidPipeline, MagiPipeline,
        CausalDiffusionPipeline, ContinuousBatcher,
        InteractiveSession, InferixProfiler,
    )
"""
from __future__ import annotations

__version__ = "0.1.0"

_LAZY = {
    "EngineConfig": "inferix_tpu.core.config",
    "ModelConfig": "inferix_tpu.core.config",
    "ParallelConfig": "inferix_tpu.core.config",
    "QuantConfig": "inferix_tpu.core.config",
    "RuntimeConfig": "inferix_tpu.core.config",
    "tiny_test_config": "inferix_tpu.core.config",
    "DecodeMode": "inferix_tpu.core.types",
    "StreamingMode": "inferix_tpu.core.types",
    "MemoryMode": "inferix_tpu.core.types",
    "InteractiveSession": "inferix_tpu.core.interactive",
    "AsyncMemoryManager": "inferix_tpu.core.memory",
    "SelfForcingPipeline": "inferix_tpu.pipeline.self_forcing",
    "CausVidPipeline": "inferix_tpu.pipeline.causvid",
    "CausalDiffusionPipeline": "inferix_tpu.pipeline.self_forcing_cfg",
    "MagiPipeline": "inferix_tpu.pipeline.magi",
    "MagiVideoPipeline": "inferix_tpu.pipeline.magi",
    "ContinuousBatcher": "inferix_tpu.pipeline.continuous",
    "SemiARGenerator": "inferix_tpu.pipeline.semi_ar",
    "KVCacheManager": "inferix_tpu.kvcache.manager",
    "KVCacheRequest": "inferix_tpu.kvcache.manager",
    "CausalVAE": "inferix_tpu.models.wan.vae",
    "WanTextEncoder": "inferix_tpu.models.text.umt5",
    "InferixProfiler": "inferix_tpu.profiling.profiler",
    "ProfilingConfig": "inferix_tpu.profiling.profiler",
    "create_streaming_backend": "inferix_tpu.core.media.streaming_backend",
    "FlowUniPCMultistep": "inferix_tpu.models.schedulers.fm_solvers",
    "FlowDPMSolverMultistep": "inferix_tpu.models.schedulers.fm_solvers",
    "DiffusionAnalyzer": "inferix_tpu.profiling.diffusion_analyzer",
    "initialize_multihost": "inferix_tpu.parallel.multihost",
    "make_global_mesh": "inferix_tpu.parallel.multihost",
    "make_mesh": "inferix_tpu.parallel.mesh",
    "pp_pipeline": "inferix_tpu.parallel.pipeline_parallel",
    "sp_cache_attention": "inferix_tpu.parallel.distributed_attention",
    "create_prompt_expander": "inferix_tpu.utils.prompt_extend",
    "register_flow_metrics": "inferix_tpu.eval.flow_metrics",
    "evaluate_video": "inferix_tpu.eval.vde",
    "quality_delta": "inferix_tpu.eval.vde",
}

__all__ = sorted(_LAZY)


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module 'inferix_tpu' has no attribute {name!r}")
