"""Profiled real-chip run: the repo's own profiler instrumenting a 21-frame
int8 fast-context generation, producing the JSON+HTML report artifact
(PROFILE_r02.*) — demonstrates the profiling subsystem end-to-end on TPU
(reference example/profiling/self_forcing_profiling.py scenario)."""
import dataclasses
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig
from inferix_tpu.core.types import DecodeMode
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline
from inferix_tpu.profiling.profiler import InferixProfiler, ProfilingConfig

cfg = EngineConfig()
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = False
cfg.runtime = dataclasses.replace(
    cfg.runtime, context_mode="last_step", decode_mode=DecodeMode.NO_DECODE)

prof = InferixProfiler(ProfilingConfig(
    output_dir="/root/repo/profiling_reports", report_format="both"))
pipe = SelfForcingPipeline(cfg, profiler=prof, dtype=jnp.bfloat16)
pipe.setup()

# warm (compile) outside the profiled session
lat = pipe.run_text_to_video(["warmup"], decode_mode=DecodeMode.NO_DECODE)
np.asarray(lat[(0, 0, 0, 0, 0)])

prof.reset()
# the block callback forces a host readback per block so the profiler's
# stage/block timings reflect device completion, not async dispatch (the
# axon relay's block_until_ready returns early; NO_DECODE otherwise records
# enqueue times)
def _sync_block(x0, i):
    np.asarray(jax.device_get(x0[(0,) * x0.ndim]))


lat = pipe.run_text_to_video(
    ["a harbor at dawn"], decode_mode=DecodeMode.NO_DECODE,
    block_callback=_sync_block)
np.asarray(lat[(0, 0, 0, 0, 0)])
paths = prof.save_report()
print("report:", paths)
print("summary ttfb:", prof.summary().get("time_to_first_block_s"))
