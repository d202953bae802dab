"""Bisect the tp x pp composed MAGI pp-forward rendezvous deadlock.

Calls magi_forward_pp directly on a tp2 x pp2 CPU mesh with sp_mode
toggled: 'none' (GSPMD-auto attention inside the pp body) vs 'cso'
(nested (tp, sp) islands inside the pp body). Toy pp_pipeline
compose_auto with plain matmuls already passes — the failure is in
whichever attention route deadlocks the pp ppermute rendezvous.

Usage: python exp/r17_pp_compose_bisect.py [none|cso] [quant0|quant1]
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as dc
import functools

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

sys.path.insert(0, "/root/repo")

from inferix_tpu.core.config import ParallelConfig
from inferix_tpu.kvcache.cache import init_kv_cache
from inferix_tpu.models.magi.dit import (
    build_rope_tables,
    init_magi_params,
    magi_forward,
    magi_forward_pp,
    make_magi_statics,
    tiny_magi_config,
)
from inferix_tpu.parallel.mesh import (
    magi_kv_cache_pspec,
    magi_param_pspecs,
    make_mesh,
    to_named,
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "none"
QUANT = (sys.argv[2] if len(sys.argv) > 2 else "quant0") == "quant1"

mcfg = dc.replace(tiny_magi_config(), num_attention_heads=4,
                  num_query_groups=4)
mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=2, pp=2))
params = init_magi_params(jax.random.key(5), mcfg, jnp.float32)
rope = build_rope_tables(mcfg.kv_channels, mcfg.rope_max_seq_len)

batch = 2
statics = make_magi_statics(mcfg, batch, 8, 8, 4, jnp.float32, mesh=mesh,
                            sp_mode=MODE, quantize_kv=QUANT)
statics1 = make_magi_statics(mcfg, batch, 8, 8, 4, jnp.float32,
                             quantize_kv=QUANT)

cw = mcfg.chunk_width
ct = statics.geo.chunk_tokens
x = jax.random.normal(jax.random.key(1),
                      (batch, cw, 8, 8, mcfg.in_channels), jnp.float32)
t = jnp.full((batch, 1), 0.4, jnp.float32)
caps = jax.random.normal(jax.random.key(2),
                         (batch, 1, mcfg.caption_max_length,
                          mcfg.caption_channels), jnp.float32)
cmask = jnp.ones((batch, 1, mcfg.caption_max_length), jnp.int32)
kvr = jnp.asarray([[0, 1]], jnp.int32)

# single-device reference
cache1 = init_kv_cache(statics1.spec)
ref, _ = jax.jit(functools.partial(
    magi_forward, statics=statics1, rope_tables=rope))(
    params, x_window=x, t=t, captions=caps, caption_mask=cmask,
    cache=cache1, slice_point=jnp.int32(0), kv_ranges=kvr)
ref = np.asarray(ref)
print("single-device ok", ref.shape, flush=True)

params_s = jax.device_put(params, to_named(magi_param_pspecs(params), mesh))
cache = init_kv_cache(statics.spec)
cache = jax.device_put(cache, jax.tree.map(
    lambda f: NamedSharding(mesh, magi_kv_cache_pspec(
        f.dtype != cache.k.dtype if False else (f.ndim == 4), pp=True)),
    cache))
got, _ = jax.jit(functools.partial(
    magi_forward_pp, statics=statics, rope_tables=rope, mesh=mesh))(
    params_s, x_window=x, t=t, captions=caps, caption_mask=cmask,
    cache=cache, slice_point=jnp.int32(0), kv_ranges=kvr)
got = np.asarray(got)
np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
print(f"pp-composed mode={MODE} quant={QUANT} matches single device",
      flush=True)
