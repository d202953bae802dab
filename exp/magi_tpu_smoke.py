"""MAGI walk on the real chip: exercises the GQA-folded flash kernel with
nonzero kv_start spans (never hit by the Wan bench), the rebuilt layer
graph, learned rope, and the noise2clean kv-range policy."""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")

from inferix_tpu.models.magi.dit import MagiModelConfig, init_magi_params
from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

cfg = MagiModelConfig(
    num_layers=4, hidden_size=1024, ffn_hidden_size=4096,
    num_attention_heads=8, num_query_groups=4, kv_channels=128,
    caption_channels=512, caption_max_length=64, chunk_width=2,
    rope_max_seq_len=64)
rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2,
                       cfg_number=1, noise2clean_kvrange=(3, 2),
                       clean_chunk_kvrange=1)
params = init_magi_params(jax.random.key(0), cfg, jnp.bfloat16)
pipe = MagiPipeline(cfg, rt, params=params, latent_h=32, latent_w=32,
                    max_chunks=8, dtype=jnp.bfloat16)
cap = jax.random.normal(jax.random.key(1),
                        (1, cfg.caption_max_length, cfg.caption_channels),
                        jnp.bfloat16)
cmask = jnp.ones((1, cfg.caption_max_length))
t0 = time.perf_counter()
chunks = dict(pipe.generate_chunks(cap, cmask, chunk_num=6,
                                   rng=jax.random.key(2)))
last = np.asarray(jax.device_get(list(chunks.values())[-1]))
dt = time.perf_counter() - t0
print(json.dumps({
    "metric": "magi_tpu_smoke",
    "chunks": len(chunks),
    "finite": bool(all(np.isfinite(np.asarray(v)).all()
                       for v in chunks.values())),
    "wall_s_incl_compile": round(dt, 1),
}))
