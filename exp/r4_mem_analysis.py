"""Where does the rolling-window serving program's HBM scratch go?

The B=4 capacity attempt OOM'd with `program 9.20G` scratch on top of
8.22G arguments, and B=3 with `program 11.01G` — scratch ~2x the cache
set and non-monotone in batch. This probe AOT-compiles the persisting
denoise-step program at a given batch ENTIRELY CHIPLESSLY (host arrays +
abstract lowering, compile via the tunnel's AOT helper) and prints XLA's
memory analysis, so scratch scaling can be measured without touching HBM.

Usage: python exp/r4_mem_analysis.py [batch] [local_attn(0=full)]
"""
import dataclasses
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import EngineConfig
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.semi_ar import SemiARGenerator
from inferix_tpu.quant.api import quantize_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 3
LOCAL = int(sys.argv[2]) if len(sys.argv) > 2 else 12

cfg = EngineConfig()
if LOCAL:
    cfg.model.local_attn_size = LOCAL
    cfg.model.sink_size = 1
cfg.quant.enabled = True
cfg.quant.dtype = "int8"
cfg.quant.granularity = "per_channel"
cfg.quant.quantize_kv_cache = True
cfg.runtime = dataclasses.replace(cfg.runtime, batch_size=B,
                                  context_mode="last_step")
m, r = cfg.model, cfg.runtime

# build the generator on HOST arrays so nothing lands in HBM; lower the
# jit on ShapeDtypeStructs so the tunnel's chipless AOT path compiles it
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params = quantize_params(
        init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
    gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
    xattn = gen.encode_text_context(
        jnp.zeros((B, m.text_len, m.text_dim), jnp.bfloat16))
    noise = jnp.zeros((B, m.num_frame_per_block, r.latent_height,
                       r.latent_width, r.latent_channels), jnp.bfloat16)
    cache = gen.init_cache()

from inferix_tpu.utils.memory_analysis import abstractify, analyze_program

with jax.default_device(cpu):
    an_args = abstractify((gen.params, gen.rope_tables, gen.schedule, cache,
                           xattn, noise, jax.random.key(1), jnp.int32(0)))

programs = {"steps_persist": gen._steps_persist,
            "steps_only_nopersist": gen._steps_only}
for name, jitted in programs.items():
    try:
        m = analyze_program(jitted, *an_args, abstract=False)
    except Exception as e:  # noqa: BLE001 — OOM reports surface as RuntimeError
        print(f"== {name} B={B} local={LOCAL}: compile failed: "
              f"{str(e)[:500]}")
        continue
    print(json.dumps({
        "exp": f"mem_analysis_{name}", "batch": B, "local_attn": LOCAL,
        **{k: round(v, 3) for k, v in m.items()},
    }), flush=True)
