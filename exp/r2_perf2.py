"""Round-2 perf experiments, take 2: null-subtracted timing, params as
arguments (no giant captured constants), raised scoped-vmem for big-block
kernels."""
import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, SQ, SKV, H, D = 1, 4680, 32760, 12, 128
DIM, FFN = 1536, 8960
N_ITER = 32


def _sync(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


_null = None


def null_overhead():
    global _null
    if _null is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128))
        _sync(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(x))
            ts.append(time.perf_counter() - t0)
        _null = min(ts)
        print(f"# null overhead {_null*1e3:.2f} ms", flush=True)
    return _null


def timeit(fn, *args, n=N_ITER, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - null_overhead(), 1e-9) / n


def emit(name, **kw):
    line = json.dumps({"exp": name, **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in kw.items()}})
    print(line, flush=True)
    with open("/root/repo/exp/r2_results.jsonl", "a") as f:
        f.write(line + "\n")


def exp_linear():
    key = jax.random.key(0)
    for (m, k, n) in [(SQ, DIM, FFN), (SQ, DIM, DIM), (SQ, FFN, DIM),
                      (SQ, DIM, 3 * DIM)]:
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(key, (k, n), jnp.bfloat16)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 16), -127, 127
                      ).astype(jnp.int8)
        wsc = jnp.full((n,), 1 / 16, jnp.float32)

        @jax.jit
        def run_bf16(x, w):
            def body(c, _):
                y = jnp.dot(c, w)
                return (c + y[:, : c.shape[1]] * 1e-24).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=N_ITER)
            return c

        @jax.jit
        def run_i8(x, w8, wsc):
            def body(c, _):
                cf = c.astype(jnp.float32)
                am = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1, keepdims=True),
                                 1e-8)
                cq = jnp.clip(jnp.round(cf * (127.0 / am)), -127, 127
                              ).astype(jnp.int8)
                acc = jax.lax.dot_general(cq, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * (am / 127.0) * wsc[None]
                     ).astype(c.dtype)
                return (c + y[:, : c.shape[1]] * 1e-24).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=N_ITER)
            return c

        gf = 2 * m * k * n / 1e9
        t_bf = timeit(run_bf16, x, w)
        t_i8 = timeit(run_i8, x, w8, wsc)
        emit("linear2", shape=[m, k, n], bf16_ms=t_bf * 1e3,
             bf16_tfs=gf / t_bf / 1e3, i8_ms=t_i8 * 1e3,
             i8_tfs=gf / t_i8 / 1e3, speedup=t_bf / t_i8)


def _attn_inputs(key, skv=SKV, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, SQ, H, D), dtype)
    k = jax.random.normal(kk, (B, skv, H, D), dtype)
    v = jax.random.normal(kv, (B, skv, H, D), dtype)
    return q, k, v


def _time_attn(fn, q, k, v, kv_len, **kw):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = fn(c, k, v, kv_len, **kw)
            return (c + o * 1e-24).astype(c.dtype), None
        c, _ = jax.lax.scan(body, q, None, length=N_ITER)
        return c
    return timeit(run, q, k, v)


def exp_attn_blocks():
    from inferix_tpu.ops.flash_attention import flash_attention_prefix
    q, k, v = _attn_inputs(jax.random.key(1))
    kv_len = jnp.int32(SKV)
    gf = 4 * B * H * SQ * SKV * D / 1e9
    for (qb, kb) in [(1024, 1024), (2368, 1024), (1024, 2048),
                     (2368, 2048), (2048, 1024), (2048, 2048),
                     (1568, 1024)]:
        try:
            t = _time_attn(flash_attention_prefix, q, k, v, kv_len,
                           q_block=qb, kv_block=kb)
            emit("attn_block2", q_block=qb, kv_block=kb, ms=t * 1e3,
                 tfs=gf / t / 1e3)
        except Exception as e:
            emit("attn_block2", q_block=qb, kv_block=kb,
                 error=repr(e)[:200])


def exp_forward_breakdown():
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.models.wan.causal_dit import (
        init_params, make_statics, build_rope_tables,
        precompute_crossattn_cache, dit_forward_inference)
    from inferix_tpu.kvcache.cache import init_kv_cache
    import inferix_tpu.models.wan.causal_dit as dit_mod

    cfg = EngineConfig()
    m, r = cfg.model, cfg.runtime
    params = init_params(jax.random.key(0), m, dtype=jnp.bfloat16)
    statics = make_statics(m, 1, m.num_frame_per_block, r.latent_height,
                           r.latent_width, jnp.bfloat16)
    tables = build_rope_tables(m.head_dim, m.rope_max_seq_len)
    ctx = jnp.zeros((1, m.text_len, m.text_dim), jnp.bfloat16)
    xattn = jax.jit(functools.partial(precompute_crossattn_cache, cfg=m))(
        params, context=ctx)
    cache = init_kv_cache(statics.spec)
    x = jax.random.normal(jax.random.key(3),
                          (1, m.num_frame_per_block, r.latent_height,
                           r.latent_width, r.latent_channels), jnp.bfloat16)
    t_arr = jnp.full((1, m.num_frame_per_block), 500.0, jnp.float32)
    start = jnp.int32(18 * 1560)  # near-full cache

    def make_run(persist):
        @jax.jit
        def run(params, cache, xattn, x):
            def body(c, _):
                flow, _ = dit_forward_inference(
                    params, statics, tables, c, t_arr, xattn, cache, start,
                    persist_kv=persist)
                return (c + flow[..., : c.shape[-1]] * 1e-24
                        ).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=4)
            return c
        return run

    for persist in (True, False):
        t = timeit(make_run(persist), params, cache, xattn, x, n=4)
        emit("forward2", persist_kv=persist, ms=t * 1e3)

    real = dit_mod.cache_attention

    def stub(q, k, v, kv_mask=None, scale=None, **kw):
        return q * (1.0 + 1e-24 * k[:, :1, :1, :1].astype(q.dtype).sum())

    dit_mod.cache_attention = stub
    try:
        t = timeit(make_run(False), params, cache, xattn, x, n=4)
        emit("forward2_noattn", ms=t * 1e3)
    finally:
        dit_mod.cache_attention = real


EXPS = {
    "linear": exp_linear,
    "attn_blocks": exp_attn_blocks,
    "forward_breakdown": exp_forward_breakdown,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPS)
    for name in names:
        print(f"=== {name} ===", flush=True)
        try:
            EXPS[name]()
        except Exception as e:
            emit(name, error=repr(e)[:300])
