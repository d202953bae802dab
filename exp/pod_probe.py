"""First-real-pod measurement driver (VERDICT r4 item 4).

One subcommand per question the first 8-chip session must answer; every
run appends one JSON line to exp/pod_results/pod.jsonl so an unattended
queue (exp/run_pod_queue.sh) collects everything even if a later step
fails. Pass/fail criteria are PRE-REGISTERED in exp/POD_RUNBOOK.md and
BASELINE.md — do not move the goalposts after the numbers land.

Subcommands:
  sanity                 device census + tiny sharded all-reduce
  wan_sp SP [MODE]       Wan 1.3B REAL shape, int8+int8KV serving config,
                         sp-sharded denoise block (MODE ulysses|ring_pass_q,
                         default ulysses); SP=1 records the baseline row
  magi_ab SP STRATEGY    MAGI 4.5B REAL shape (34L/h3072/24h/8g, 12150-token
                         chunks, window 4, int8 W8A8 + int8 KV, per-chunk
                         dispatch), one window's forwards at cp=STRATEGY
                         (ulysses|cso); TRACE=1 captures a profiler trace
                         and reports exposed all-to-all time
  magi24b TP SP PP       24B base config (48L/h6144/48h/8g, SwiGLU via the
                         gate/up split, x_rescale, GQA), cfg3 per-chunk,
                         ONE window forward on the composed mesh
                         (validated factorizations: 4 1 2 and 2 2 2)

Plumbing validation without a pod: POD_VIRTUAL=8 runs every subcommand on
8 virtual CPU devices at tiny shapes (wall times are then meaningless —
the flag exists so the queue is known-good before chips are attached).
"""
import json
import os
import sys
import time

_virtual = int(os.environ.get("POD_VIRTUAL", "0"))
if _virtual:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_virtual}").strip()

import jax

if _virtual:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS = "/root/repo/exp/pod_results"
TRACE_DIR = "/tmp/pod_trace"


def emit(rec):
    os.makedirs(RESULTS, exist_ok=True)
    rec["virtual"] = bool(_virtual)
    rec["n_devices"] = jax.device_count()
    line = json.dumps(rec)
    print(line, flush=True)
    with open(os.path.join(RESULTS, "pod.jsonl"), "a") as f:
        f.write(line + "\n")


def _sync(tree):
    np.asarray(jax.device_get(jax.tree.leaves(tree)[0].ravel()[0]))


# ---------------------------------------------------------------------------

def sanity():
    devs = jax.devices()
    from inferix_tpu.core.config import ParallelConfig
    from inferix_tpu.parallel.mesh import make_mesh

    n = len(devs)
    pcfg = ParallelConfig(dp=1, sp=1, tp=n, pp=1)
    mesh = make_mesh(pcfg)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(jnp.arange(n * 128.0).reshape(n, 128),
                       NamedSharding(mesh, P("tp", None)))
    s = jax.jit(lambda x: jnp.sum(x))(x)
    emit({"probe": "sanity", "devices": [str(d) for d in devs],
          "allreduce_ok": bool(np.isfinite(float(s)))})


def wan_sp(sp: int, mode: str = "ulysses"):
    """Real-shape Wan 1.3B denoise block, int8 linears + int8 KV, tokens/s.

    PRE-REGISTERED pass rule (BASELINE.md target): tokens_per_s(sp=N) /
    (N * tokens_per_s(sp=1)) >= 0.80 for N in {2, 4}."""
    import functools

    from jax.sharding import NamedSharding

    from inferix_tpu.core.config import EngineConfig, ParallelConfig, \
        tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.parallel.mesh import (
        make_mesh, param_pspecs, to_named, wan_kv_cache_pspec, latent_pspec,
        xattn_cache_pspec)
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator, \
        _denoise_block_impl
    from inferix_tpu.quant.api import quantize_params

    cfg = tiny_test_config() if _virtual else EngineConfig()
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    pcfg = ParallelConfig(dp=1, sp=sp, tp=1, pp=1, sp_mode=mode)
    cfg.parallel = pcfg
    mesh = make_mesh(pcfg) if sp > 1 else None
    dtype = jnp.float32 if _virtual else jnp.bfloat16
    params = quantize_params(
        init_params(jax.random.key(0), cfg.model, dtype=dtype), cfg.quant)
    gen = SemiARGenerator(cfg, params, dtype=dtype, mesh=mesh)
    m, r = cfg.model, cfg.runtime

    cache = gen.init_cache()
    xattn = gen.encode_text_context(
        jnp.zeros((1, m.text_len, m.text_dim), dtype))
    noisy = jax.random.normal(
        jax.random.key(1), (1, m.num_frame_per_block, r.latent_height,
                            r.latent_width, r.latent_channels)).astype(dtype)
    if mesh is not None:
        gen.params = jax.device_put(
            gen.params, to_named(param_pspecs(gen.params), mesh))
        spec_v = wan_kv_cache_pspec(mode, quantized_field=False)
        spec_s = wan_kv_cache_pspec(mode, quantized_field=True)
        cache = jax.device_put(cache, jax.tree.map(
            lambda f: NamedSharding(mesh, spec_s if f.ndim == 4 else spec_v),
            cache))
        xattn = jax.device_put(xattn, jax.tree.map(
            lambda _: NamedSharding(
                mesh, xattn_cache_pspec()), xattn))
        from jax.sharding import NamedSharding as NS
        noisy = jax.device_put(noisy, NS(mesh, latent_pspec()))

    fn = jax.jit(functools.partial(
        _denoise_block_impl, statics=gen.statics, steps=gen.denoising_steps,
        context_noise=gen.context_noise), donate_argnames=("cache",))

    def step(key):
        nonlocal cache
        x0, cache = fn(gen.params, gen.rope_tables, gen.schedule, cache,
                       xattn, noisy, key, jnp.int32(0))
        return x0

    ctx = mesh or jax.sharding.Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1),
        ("dp", "sp", "tp", "pp"))
    with ctx:
        x0 = step(jax.random.key(2))
        _sync(x0)
        n_steps = 3 if _virtual else 8
        t0 = time.perf_counter()
        for i in range(n_steps):
            x0 = step(jax.random.key(3 + i))
        _sync(x0)
        dt = (time.perf_counter() - t0) / n_steps

    tokens = m.num_frame_per_block * (r.latent_height // 2) \
        * (r.latent_width // 2)
    emit({"probe": "wan_sp", "sp": sp, "mode": mode,
          "block_ms": round(dt * 1e3, 2),
          "tokens_per_s": round(tokens / dt, 1)})


def _build_magi45b(cp_strategy: str, sp: int, tp: int = 1, pp: int = 1):
    import dataclasses as _dc

    from inferix_tpu.core.config import ParallelConfig
    from inferix_tpu.models.magi.dit import (MagiModelConfig,
                                             init_magi_params,
                                             tiny_magi_config)
    from inferix_tpu.parallel.mesh import make_mesh
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    if _virtual:
        mcfg = _dc.replace(tiny_magi_config(), num_attention_heads=4,
                           num_query_groups=4)
        lat_h = lat_w = 8
        rt = MagiRuntimeConfig(num_steps=4, window_size=2, chunk_width=2,
                               cp_strategy=cp_strategy, cfg_number=3,
                               quantize_kv=True,
                               window_dispatch="per_chunk")
        max_chunks = 6
    else:
        mcfg = MagiModelConfig()           # defaults ARE 4.5B
        lat_h = lat_w = 90                 # 720x720
        rt = MagiRuntimeConfig(num_steps=64, window_size=4, chunk_width=6,
                               cp_strategy=cp_strategy, cfg_number=3,
                               quantize_kv=True, span_grid=True,
                               window_dispatch="per_chunk",
                               noise2clean_kvrange=(5, 4, 3, 2))
        max_chunks = 9
    mesh = make_mesh(ParallelConfig(dp=1, sp=sp, tp=tp, pp=pp)) \
        if sp * tp * pp > 1 else None
    dtype = jnp.float32 if _virtual else jnp.bfloat16
    params = init_magi_params(jax.random.key(0), mcfg, dtype)
    if not _virtual:
        # W8A8 int8 serving weights (same layout the distill-quant
        # requantization produces)
        from inferix_tpu.quant.api import magi_quantize_params_int8

        params = magi_quantize_params_int8(params)
    pipe = MagiPipeline(mcfg, rt, params=params, latent_h=lat_h,
                        latent_w=lat_w, max_chunks=max_chunks, dtype=dtype,
                        mesh=mesh)
    return mcfg, pipe


def magi_ab(sp: int, strategy: str):
    """4.5B real-shape window walk at cp=STRATEGY over sp chips.

    PRE-REGISTERED decision rule (SCALING_r04.json): serve ULYSSES unless
    the trace shows its per-layer a2a pair NOT overlapped (>5% of layer
    time exposed) while CSO's per-chunk chains hide under per-chunk
    attention."""
    mcfg, pipe = _build_magi45b(strategy, sp)
    cap = jnp.zeros((1, mcfg.caption_max_length, mcfg.caption_channels),
                    pipe.dtype)
    cmask = jnp.ones((1, mcfg.caption_max_length), jnp.int32)

    n_chunks = 2 if _virtual else 3
    t0 = time.perf_counter()
    trace = os.environ.get("TRACE", "0") == "1"
    chunks = []
    if trace:
        os.makedirs(TRACE_DIR, exist_ok=True)
        with jax.profiler.trace(TRACE_DIR):
            for c, lat in pipe.generate_chunks(cap, cmask,
                                               chunk_num=n_chunks):
                chunks.append((c, lat))
            _sync(chunks[-1][1])
    else:
        for c, lat in pipe.generate_chunks(cap, cmask, chunk_num=n_chunks):
            chunks.append((c, lat))
        _sync(chunks[-1][1])
    dt = time.perf_counter() - t0

    rec = {"probe": "magi_ab", "sp": sp, "strategy": strategy,
           "chunks": n_chunks, "walk_s": round(dt, 2),
           "s_per_chunk": round(dt / n_chunks, 2),
           "finite": bool(np.isfinite(np.asarray(chunks[-1][1])).all())}
    if trace:
        try:
            sys.path.insert(0, "/root/repo/exp")
            from r6_op_breakdown import parse_xplane

            rows = parse_xplane(TRACE_DIR, top=200)
            a2a = sum(r["ms_total"] for r in rows
                      if "op" in r and "all-to-all" in r["op"])
            total = sum(r["ms_total"] for r in rows if "op" in r)
            rec["a2a_ms_total"] = round(a2a, 1)
            rec["device_ms_total"] = round(total, 1)
            rec["a2a_share"] = round(a2a / max(total, 1e-9), 4)
        except Exception as e:  # noqa: BLE001
            rec["trace_error"] = str(e)[:200]
    emit(rec)


def magi24b(tp: int, sp: int, pp: int):
    """24B base config, cfg3 per-chunk, one window forward on the composed
    mesh. PRE-REGISTERED fit claim to confirm (BASELINE.md round-4 AOT):
    tp4 x pp2 13.88 GiB/chip, tp2 x sp2 x pp2 14.67 GiB/chip."""
    import dataclasses as _dc

    from inferix_tpu.models.magi.dit import MagiModelConfig, tiny_magi_config

    if _virtual:
        base = _dc.replace(tiny_magi_config(), num_attention_heads=8,
                           num_query_groups=8, gated_linear_unit=True,
                           x_rescale_factor=0.1)
    else:
        base = MagiModelConfig(
            num_layers=48, hidden_size=6144, ffn_hidden_size=16384,
            num_attention_heads=48, num_query_groups=8,
            gated_linear_unit=True, x_rescale_factor=0.1,
            half_channel_vae=True)

    import inferix_tpu.models.magi.dit as dit_mod
    from inferix_tpu.core.config import ParallelConfig
    from inferix_tpu.parallel.mesh import make_mesh
    from inferix_tpu.pipeline.magi import MagiPipeline, MagiRuntimeConfig

    rt = MagiRuntimeConfig(
        num_steps=4 if _virtual else 64,
        window_size=2 if _virtual else 4,
        chunk_width=2 if _virtual else 6,
        cp_strategy="cso", cfg_number=3, quantize_kv=True,
        window_dispatch="per_chunk")
    lat = 8 if _virtual else 90
    params = dit_mod.init_magi_params(
        jax.random.key(0), base, jnp.float32 if _virtual else jnp.bfloat16)
    if not _virtual:
        from inferix_tpu.quant.api import magi_quantize_params_int8

        params = magi_quantize_params_int8(params)
    mesh = make_mesh(ParallelConfig(dp=1, sp=sp, tp=tp, pp=pp))
    pipe = MagiPipeline(base, rt, params=params, latent_h=lat, latent_w=lat,
                        max_chunks=6 if _virtual else 9,
                        dtype=jnp.float32 if _virtual else jnp.bfloat16,
                        mesh=mesh)
    cap = jnp.zeros((1, base.caption_max_length, base.caption_channels),
                    pipe.dtype)
    cmask = jnp.ones((1, base.caption_max_length), jnp.int32)
    t0 = time.perf_counter()
    chunks = list(pipe.generate_chunks(cap, cmask, chunk_num=1))
    _sync(chunks[-1][1])
    dt = time.perf_counter() - t0
    emit({"probe": "magi24b", "tp": tp, "sp": sp, "pp": pp,
          "first_chunk_s": round(dt, 2),
          "finite": bool(np.isfinite(np.asarray(chunks[-1][1])).all())})


def disagg(n_dec: int = 1):
    """Disaggregated TRUE_STREAMING: gen on chip 0, PER_BLOCK VAE decode on
    `n_dec` dedicated decode chips (spatially tiled when n_dec > 1).

    Single-chip HEAD measured interleaved wall = gen + decode EXACTLY
    (BASELINE.md round-5: 0.80 s gen + 0.73 s decode = 1.53 s/block
    lossless). With decode on its own chip(s), the decode program executes
    while the next block's denoise runs, so steady-state block wall should
    approach max(gen, decode).

    PRE-REGISTERED pass rule: interleaved_block_ms <=
    1.15 * max(gen_block_ms, decode_block_ms). Lossless expectation:
    ~0.81 s/block => ~14.8 pixel f/s from 2 chips (vs 7.84 from 1)."""
    import functools

    from inferix_tpu.core.config import EngineConfig, tiny_test_config
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig
    from inferix_tpu.parallel.disaggregated import DisaggregatedVAEDecoder
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator, \
        _denoise_block_impl
    from inferix_tpu.quant.api import quantize_params

    devs = jax.devices()
    assert len(devs) >= 1 + n_dec, f"need {1 + n_dec} devices"
    dec_devs = devs[1:1 + n_dec]

    cfg = tiny_test_config() if _virtual else EngineConfig()
    cfg.quant.enabled = True
    cfg.quant.quantize_kv_cache = True
    cfg.runtime.context_mode = "last_step"  # fast-context serving config
    dtype = jnp.float32 if _virtual else jnp.bfloat16
    params = quantize_params(
        init_params(jax.random.key(0), cfg.model, dtype=dtype), cfg.quant)
    params = jax.device_put(params, devs[0])
    gen = SemiARGenerator(cfg, params, dtype=dtype)
    m, r = cfg.model, cfg.runtime

    vcfg = VAEConfig() if not _virtual else VAEConfig(
        dim=16, z_dim=r.latent_channels, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,))
    vae = CausalVAE(vcfg, key=jax.random.key(9), dtype=dtype)
    dec = DisaggregatedVAEDecoder(vae, dec_devs, overlap=2)

    cache = jax.device_put(gen.init_cache(), devs[0])
    xattn = gen.encode_text_context(
        jnp.zeros((1, m.text_len, m.text_dim), dtype))
    fn = jax.jit(functools.partial(
        _denoise_block_impl, statics=gen.statics, steps=gen.denoising_steps,
        context_noise=gen.context_noise), donate_argnames=("cache",))

    def gen_step(blk):
        nonlocal cache
        noisy = jax.random.normal(
            jax.random.key(100 + blk),
            (1, m.num_frame_per_block, r.latent_height, r.latent_width,
             r.latent_channels)).astype(dtype)
        x0, cache = fn(gen.params, gen.rope_tables, gen.schedule, cache,
                       xattn, noisy, jax.random.key(blk),
                       jnp.int32((blk % 4) * m.num_frame_per_block))
        return x0

    n_blocks = 2 if _virtual else 8
    # warm: one first block + TWO steady blocks (the steady decode program
    # compiles on the first first=False call and once more when the carried
    # cache becomes decode-device-committed — measured on virtual devices)
    x0 = gen_step(0)
    px, dcache = dec.decode_chunk(x0, None, first=True)
    px.block_until_ready()
    for wb in (30, 31):
        xw = gen_step(wb)
        px, dcache = dec.decode_chunk(xw, dcache, first=False)
        px.block_until_ready()

    # gen-only rate
    _sync(gen_step(1))
    t0 = time.perf_counter()
    for b in range(n_blocks):
        x0 = gen_step(2 + b)
    _sync(x0)
    gen_ms = (time.perf_counter() - t0) / n_blocks * 1e3

    # decode-only rate (steady-state cache, decode devices)
    px, dcache = dec.decode_chunk(x0, dcache, first=False)
    px.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        px, dcache = dec.decode_chunk(x0, dcache, first=False)
    px.block_until_ready()
    dec_ms = (time.perf_counter() - t0) / n_blocks * 1e3

    # interleaved: decode of block i overlaps denoise of block i+1
    t0 = time.perf_counter()
    last = None
    for b in range(n_blocks):
        x0 = gen_step(20 + b)
        last, dcache = dec.decode_chunk(x0, dcache, first=False)
    _sync(x0)
    last.block_until_ready()
    inter_ms = (time.perf_counter() - t0) / n_blocks * 1e3

    px_frames = 4 * m.num_frame_per_block  # steady-state pixels per block
    emit({"probe": "disagg", "n_dec": n_dec,
          "gen_block_ms": round(gen_ms, 1),
          "decode_block_ms": round(dec_ms, 1),
          "interleaved_block_ms": round(inter_ms, 1),
          "overlap_ratio": round(inter_ms / max(gen_ms, dec_ms), 3),
          "pixel_fps": round(px_frames / (inter_ms / 1e3), 2),
          "pass_rule": "interleaved <= 1.15 * max(gen, decode)",
          "passed": bool(inter_ms <= 1.15 * max(gen_ms, dec_ms))})


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "sanity":
        sanity()
    elif cmd == "wan_sp":
        wan_sp(int(sys.argv[2]),
               sys.argv[3] if len(sys.argv) > 3 else "ulysses")
    elif cmd == "magi_ab":
        magi_ab(int(sys.argv[2]), sys.argv[3])
    elif cmd == "magi24b":
        magi24b(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif cmd == "disagg":
        disagg(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
