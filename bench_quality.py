"""Quantization quality-delta harness run: bf16 vs int8 generation.

BASELINE.md requires the quant config to hold a small VBench delta vs bf16.
Real Wan checkpoints do not exist in this environment, so this harness runs
both precisions from the SAME random-init weights and seed and reports the
relative per-metric divergence of the decoded videos (quality_delta from
`eval/vde.py`, including the optical-flow + MUSIQ-style plug-ins). With
identical weights the true content is identical — any delta is pure
numerical divergence introduced by quantization, which is exactly the
quantity the <=0.5 VBench-delta gate bounds. Writes QUALITY_r05.json and
prints one JSON line.
"""
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np


def generate(cfg, params, dtype=jnp.bfloat16):
    from inferix_tpu.pipeline.semi_ar import SemiARGenerator

    m, r = cfg.model, cfg.runtime
    gen = SemiARGenerator(cfg, params, dtype=dtype)
    xattn = gen.encode_text_context(
        jnp.zeros((1, m.text_len, m.text_dim), dtype))
    noise = jax.random.normal(
        jax.random.key(11),
        (1, r.num_frames, r.latent_height, r.latent_width,
         r.latent_channels)).astype(dtype)
    latents, _ = gen.generate(noise, xattn, jax.random.key(12))
    return np.asarray(latents.astype(jnp.float32))


def main():
    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.eval.flow_metrics import register_flow_metrics
    from inferix_tpu.eval.vde import quality_delta
    from inferix_tpu.models.wan.causal_dit import init_params
    from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig
    from inferix_tpu.quant.api import quantize_params

    register_flow_metrics()
    # real VBench models when checkpoints exist (the BASELINE "VBench
    # delta <= 0.5" gate): VBENCH_WEIGHTS points at a json spec of
    # {metric: builder-kwargs} (eval/vbench_real.register_real_metrics)
    spec_path = os.environ.get("VBENCH_WEIGHTS")
    if spec_path:
        import json as _json

        from inferix_tpu.eval.vbench_real import register_real_metrics

        with open(spec_path) as f:
            built = register_real_metrics(_json.load(f))
        print(f"[quality] real VBench metrics active: {sorted(built)}")
    cfg = EngineConfig()
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.bfloat16)

    lat_bf16 = generate(cfg, params, jnp.bfloat16)

    qcfg = EngineConfig()
    qcfg.quant.enabled = True
    qcfg.quant.dtype = "int8"
    qcfg.quant.granularity = "per_channel"
    lat_int8 = generate(qcfg, quantize_params(params, qcfg.quant),
                        jnp.bfloat16)

    # decode through a small causal VAE (identical for both precisions)
    vae = CausalVAE(VAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temperal_downsample=(True, True)),
                    key=jax.random.key(3))
    vid_a = np.asarray(vae.decode(jnp.asarray(lat_bf16)))[0] * 0.5 + 0.5
    vid_b = np.asarray(vae.decode(jnp.asarray(lat_int8)))[0] * 0.5 + 0.5
    vid_a = np.clip(vid_a, 0, 1)
    vid_b = np.clip(vid_b, 0, 1)

    lat_rel = float(np.abs(lat_int8 - lat_bf16).mean()
                    / (np.abs(lat_bf16).mean() + 1e-8))
    metrics = ["clarity", "motion", "dynamic", "subject_consistency",
               "background_consistency", "clarity_musiq", "motion_flow",
               "dynamic_flow"]
    deltas = quality_delta(vid_a, vid_b, n_chunks=3, metrics=metrics)

    # fast-context mode (context_mode='last_step'): same weights/precision as
    # bf16, only the context-KV source differs — the delta isolates the cost
    # of skipping the clean-context re-run.
    fcfg = EngineConfig()
    fcfg.runtime.context_mode = "last_step"
    lat_fast = generate(fcfg, params, jnp.bfloat16)
    vid_f = np.asarray(vae.decode(jnp.asarray(lat_fast)))[0] * 0.5 + 0.5
    vid_f = np.clip(vid_f, 0, 1)
    fast_deltas = quality_delta(vid_a, vid_f, n_chunks=3, metrics=metrics)
    fast_lat_rel = float(np.abs(lat_fast - lat_bf16).mean()
                         / (np.abs(lat_bf16).mean() + 1e-8))

    # fused act-quant kernels (r4, ops/act_quant.py): same int8 recipe, the
    # one-pass Pallas quant vs the XLA chain — the delta bounds the +-1
    # quant-code flips from the f32-vs-bf16 activation rounding
    from inferix_tpu.quant.api import set_fused_act_quant

    aqcfg = EngineConfig()
    aqcfg.quant.enabled = True
    aqcfg.quant.fused_act_quant = True
    try:
        # SemiARGenerator is driven directly here (no pipeline init), so
        # apply the trace-time switch explicitly
        set_fused_act_quant(True)
        lat_aq = generate(aqcfg, quantize_params(params, aqcfg.quant),
                          jnp.bfloat16)
    finally:
        set_fused_act_quant(False)
    vid_q = np.asarray(vae.decode(jnp.asarray(lat_aq)))[0] * 0.5 + 0.5
    vid_q = np.clip(vid_q, 0, 1)
    aq_deltas = quality_delta(vid_b, vid_q, n_chunks=3, metrics=metrics)
    aq_lat_rel = float(np.abs(lat_aq - lat_int8).mean()
                       / (np.abs(lat_int8).mean() + 1e-8))
    # w8a8 VAE decode (set_vae_conv_impl("halo_w8a8"): int8 x int8 conv
    # MXU serving mode, -28..-37% per conv class) — decode the SAME bf16
    # latents through both impls; the delta is pure conv-quantization
    # error. TPU only (the kernel never routes off-TPU outside tests).
    w8a8_deltas = {}
    if jax.default_backend() == "tpu":
        from inferix_tpu.models.wan.vae import set_vae_conv_impl

        try:
            set_vae_conv_impl("halo_w8a8")
            vae_w = CausalVAE(VAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 2),
                                        num_res_blocks=1,
                                        temperal_downsample=(True, True)),
                              params=vae.params)
            vid_w = np.asarray(
                vae_w.decode(jnp.asarray(lat_bf16)))[0] * 0.5 + 0.5
        finally:
            set_vae_conv_impl("xla")
        vid_w = np.clip(vid_w, 0, 1)
        w8a8_deltas = quality_delta(vid_a, vid_w, n_chunks=3,
                                    metrics=metrics)

    out = {
        "metric": "quant_quality_delta",
        "w8a8_decode_per_metric_rel_delta": {
            k: round(v, 4) for k, v in w8a8_deltas.items()},
        "w8a8_decode_max_metric_delta": round(
            max(w8a8_deltas.values()), 4) if w8a8_deltas else None,
        "latent_mean_rel_diff": round(lat_rel, 4),
        "per_metric_rel_delta": {k: round(v, 4) for k, v in deltas.items()},
        "max_metric_delta": round(max(deltas.values()), 4),
        "fast_context_latent_mean_rel_diff": round(fast_lat_rel, 4),
        "fast_context_per_metric_rel_delta": {
            k: round(v, 4) for k, v in fast_deltas.items()},
        "fast_context_max_metric_delta": round(max(fast_deltas.values()), 4),
        "fused_act_quant_vs_int8_latent_rel_diff": round(aq_lat_rel, 4),
        "fused_act_quant_vs_int8_max_metric_delta": round(
            max(aq_deltas.values()), 4),
        "note": ("random-init weights (no checkpoints in this env): deltas "
                 "measure pure quantization-induced numerical divergence "
                 "on identical content"),
    }
    with open("QUALITY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
