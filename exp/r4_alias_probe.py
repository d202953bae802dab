"""Probe: does the donated KV cache alias in-place in the compiled TPU
program, or does XLA insert full-cache copies? Compares full-cache vs
rolling-window (ring) int8-KV variants on a tiny model and greps the
optimized HLO for copies of the cache parameters."""
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.models.wan.causal_dit import init_params
from inferix_tpu.pipeline.semi_ar import SemiARGenerator
from inferix_tpu.quant.api import quantize_params


def probe(name, local_attn):
    import dataclasses

    cfg = tiny_test_config()
    cfg.quant.enabled = True
    cfg.quant.dtype = "int8"
    cfg.quant.granularity = "per_channel"
    cfg.quant.quantize_kv_cache = True
    if local_attn > 0:
        cfg.model.local_attn_size = local_attn
        cfg.model.sink_size = 1
    cfg.runtime = dataclasses.replace(cfg.runtime, batch_size=4,
                                      context_mode="last_step")
    m, r = cfg.model, cfg.runtime
    params = quantize_params(
        init_params(jax.random.key(0), m, dtype=jnp.bfloat16), cfg.quant)
    gen = SemiARGenerator(cfg, params, dtype=jnp.bfloat16)
    xattn = gen.encode_text_context(
        jnp.zeros((4, m.text_len, m.text_dim), jnp.bfloat16))
    noise = jnp.zeros((4, m.num_frame_per_block, r.latent_height,
                       r.latent_width, r.latent_channels), jnp.bfloat16)
    cache = gen.init_cache()
    lowered = gen._steps_persist.lower(
        gen.params, gen.rope_tables, gen.schedule, cache, xattn, noise,
        jax.random.key(1), jnp.int32(0))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    cache_copies = [
        ln.strip() for ln in hlo.splitlines()
        if re.search(r"copy\(.*(cache|param)", ln) and "s8[" in ln
    ]
    big = [ln.strip() for ln in hlo.splitlines()
           if " copy(" in ln and ("s8[" in ln or "f32[" in ln)]
    print(f"== {name}: {len(big)} copy lines")
    for ln in big[:12]:
        print("  ", ln[:180])
    # where does the cache param go?
    for ln in hlo.splitlines():
        if "donated" in ln or "alias" in ln.lower():
            print("  meta:", ln.strip()[:160])
    return hlo


hlo_ring = probe("ring window int8", local_attn=2)
hlo_full = probe("full cache int8", local_attn=0)
