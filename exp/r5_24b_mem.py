"""MAGI 24B multi-chip serving plan: per-chip HBM across (tp, sp, pp).

Two analyses (VERDICT round-2 next #6):

1. --arith (chipless, runs anywhere): exact parameter/KV-cache/activation
   byte arithmetic per sharding combo.
2. --aot (needs the TPU AOT compiler through the axon tunnel): compiles a
   PER-CHIP SLICE of the model — Megatron-style tensor sharding divides
   heads/kv-heads/ffn by tp while activations keep the full hidden dim, CSO
   divides window tokens and kv heads by sp, pp divides layers — and reads
   `compiled.memory_analysis()` for the real temp/argument residency.

Geometry: 24B_base_config.json — 48L h=6144 ffn=16384 SwiGLU, 48 heads /
8 kv groups, 720x1280 -> latent 90x160, chunk 6 frames = 21600 tokens,
window 4 chunks = 86400 tokens, cfg batch 2.
"""
import argparse
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

HBM_GIB = 15.75


def gib(x):
    return x / 2**30


def model_cfg(tp=1, sp=1, pp=1):
    from inferix_tpu.models.magi.dit import MagiModelConfig

    assert 48 % tp == 0 and 8 % tp == 0 and 48 % pp == 0
    return MagiModelConfig(
        num_layers=48 // pp, hidden_size=6144,
        ffn_hidden_size=16384 // tp,
        num_attention_heads=48 // tp,
        num_query_groups=max(8 // (tp * sp), 1),
        kv_channels=128, patch_size=2, in_channels=32, out_channels=32,
        caption_channels=4096, caption_max_length=800, chunk_width=6,
        gated_linear_unit=True, half_channel_vae=True, x_rescale_factor=0.1,
        rope_max_seq_len=4096,
    )


def param_bytes(cfg, wbytes=1):
    """int8 W8A8 weights (wbytes=1) + fp32 per-channel scales."""
    h, ffn = cfg.hidden_size, cfg.ffn_hidden_size
    q = cfg.num_attention_heads * cfg.kv_channels
    kv = cfg.num_query_groups * cfg.kv_channels
    fc1 = (2 if cfg.gated_linear_unit else 1) * ffn
    per_layer_w = (h * q * 2            # q, qx
                   + h * kv * 2         # k, v
                   + cfg.xattn_dim * 2 * kv   # kv_xattn
                   + 2 * q * h          # proj
                   + h * fc1 + ffn * h)  # mlp
    per_layer_scales = (q * 2 + kv * 2 + 2 * kv + h + fc1 + h) * 4
    per_layer_other = (cfg.cond_dim * 2 * h * 4        # ada_proj fp32
                       + h * 12)                        # norms bf16-ish
    embed = (cfg.t_patch_size * cfg.patch_size**2 * cfg.in_channels * h
             + 256 * cfg.cond_dim * 4 + cfg.cond_dim**2 * 4
             + cfg.caption_channels * (cfg.xattn_dim + cfg.cond_dim)
             + cfg.caption_max_length * cfg.caption_channels
             + h * (cfg.t_patch_size * cfg.patch_size**2
                    * cfg.out_channels)) * 2
    return (cfg.num_layers * (per_layer_w * wbytes + per_layer_scales
                              + per_layer_other) + embed)


def cache_bytes(cfg, max_chunks, ct, batch=2, kv_itemsize=1, scales=True):
    """int8 window cache + per-(token, head) fp32 scales."""
    tok = max_chunks * ct
    kvdim = cfg.num_query_groups * cfg.kv_channels
    per = cfg.num_layers * batch * tok * kvdim * kv_itemsize * 2
    if scales:
        per += cfg.num_layers * batch * tok * cfg.num_query_groups * 4 * 2
    return per


def arith():
    """Per-chip bytes from the FULL geometry with EXPLICIT per-axis
    divisions matching the engine's actual shardings — do NOT bake the
    divisions into one model_cfg (an earlier version passed
    num_query_groups//(tp*sp) AND tokens//sp into shared helpers, which
    double-counted sp on the cache and over-sharded the k/v weights; the
    real layout is:
      params (magi_param_pspecs): big linears over tp only; layers over pp
      cache (magi_kv_cache_pspec / CSO island): kv heads over (tp, sp),
        TOKEN AXIS REPLICATED; layers over pp
      activations (GSPMD latents / CSO q): window tokens over sp, ffn
        hidden over tp)."""
    full_cfg = model_cfg(tp=1, sp=1, pp=1)
    full_ct = 6 * (90 // 2) * (160 // 2)     # 21600 tokens/chunk
    window = 4
    rows = []
    for tp, sp, pp in [(1, 1, 1), (2, 1, 1), (4, 1, 1), (8, 1, 1),
                       (1, 2, 1), (2, 2, 1), (4, 2, 1),
                       (4, 1, 2), (2, 2, 2), (4, 2, 2)]:
        assert 8 % (tp * sp) == 0, "kv groups must divide tp*sp"
        # params: tp shards every big linear; embedders/ada/norms replicate
        p_tp = (param_bytes(full_cfg) - param_bytes(
            dataclasses.replace(
                full_cfg, num_attention_heads=0, num_query_groups=0,
                ffn_hidden_size=0))) // tp + param_bytes(
            dataclasses.replace(
                full_cfg, num_attention_heads=0, num_query_groups=0,
                ffn_hidden_size=0))
        p = p_tp // pp  # layers over pp (embed ~0.1 GiB, ignore pp there)
        # serving window cache: noise2clean kvrange caps live prefix at 5
        # chunks + the 4-chunk window -> 9 chunk slots (cfg batch 2);
        # kv heads over (tp, sp), tokens replicated, layers over pp
        c = cache_bytes(full_cfg, max_chunks=9, ct=full_ct,
                        batch=2) // (tp * sp) // pp
        # activations: dominant live set ~ tokens/sp x max(h, fc1/tp) bf16
        # x a small fusion factor measured ~3x on the 4.5B AOT runs
        tokens = window * (full_ct // sp) * 2            # cfg batch 2
        act = tokens * max(full_cfg.hidden_size,
                           (2 if full_cfg.gated_linear_unit else 1)
                           * full_cfg.ffn_hidden_size // tp) * 2 * 3
        total = p + c + act
        # distilled serving (cfg_number=1): batch 1 halves cache + act
        total_b1 = p + c // 2 + act // 2
        rows.append(dict(tp=tp, sp=sp, pp=pp, params_gib=round(gib(p), 2),
                         cache_gib=round(gib(c), 2),
                         act_est_gib=round(gib(act), 2),
                         total_gib=round(gib(total), 2),
                         fits=total <= (HBM_GIB - 0.5) * 2**30,
                         distill_b1_total_gib=round(gib(total_b1), 2),
                         distill_b1_fits=total_b1
                         <= (HBM_GIB - 0.5) * 2**30))
    return rows


def aot(per_chunk=False, batch=2):
    """per_chunk=True compiles the window_dispatch='per_chunk' program
    (ONE chunk per dispatch, the engine's 24B configuration after the
    round-4 memory lever — pipeline/magi.py MagiRuntimeConfig) instead of
    the whole-window program whose tp4 x sp2 x pp2 AOT came back 9.86 GiB
    of temp / fits=false (exp/r6_results/mem24b.log). batch=1 compiles the
    distilled (cfg_number=1) serving shape."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import functools

    import jax.numpy as jnp

    from inferix_tpu.kvcache.cache import init_kv_cache
    from inferix_tpu.models.magi.dit import (
        magi_forward, make_magi_statics, init_magi_params)
    from inferix_tpu.utils.memory_analysis import abstractify, analyze_program
    from inferix_tpu.quant.api import magi_distill_quant_to_int8

    results = []
    for tp, sp, pp in [(4, 1, 1), (1, 2, 1), (4, 1, 2), (2, 2, 2),
                       (4, 2, 2)]:
        cfg = model_cfg(tp=tp, sp=sp, pp=pp)
        # per-chip latent slice: sp shards each chunk's HW ACTIVATION
        # tokens, but the cache's token axis is REPLICATED (only kv heads
        # shard over (tp, sp) — magi_kv_cache_pspec); max_chunks=9*sp keeps
        # the per-chip cache slice at the full 9-chunk token extent. The
        # attention grid then steps over the larger padded cache, so the
        # temp estimate is slightly conservative. Known slice biases: the
        # k/v/kv_xattn WEIGHT arguments use groups//(tp*sp) though params
        # shard over tp only (~0.15 GiB under at tp4 sp2), and attention
        # runs 48//tp q heads though the island would run 48//(tp*sp)
        # (temp over) — both second-order vs the GiB-scale terms.
        lat_h, lat_w = 90, 160 // sp
        statics = make_magi_statics(cfg, batch, lat_h, lat_w, 9 * sp,
                                    jnp.bfloat16, quantize_kv=True)
        geo = statics.geo
        n_chunks = 1 if per_chunk else 4
        # abstract params in the int8 serving layout: eval_shape avoids
        # materializing a single byte of the 24B parameter set; block
        # linears are rewritten to the {w_q int8, scale[out]} layout
        # magi_linear's int8 branch consumes
        params = jax.eval_shape(
            lambda k: init_magi_params(k, cfg, jnp.bfloat16),
            jax.random.key(0))
        linears = ("q", "qx", "k", "v", "kv_xattn", "proj", "fc1", "fc2")

        def int8ify(tree, path=""):
            if isinstance(tree, dict):
                if ("w" in tree and getattr(tree["w"], "ndim", 0) >= 2
                        and "blocks" in path
                        and path.rsplit("/", 1)[-1] in linears):
                    w = tree["w"]
                    return {
                        "w_q": jax.ShapeDtypeStruct(w.shape, jnp.int8),
                        "scale": jax.ShapeDtypeStruct(
                            w.shape[:-2] + w.shape[-1:], jnp.float32),
                    }
                return {k: int8ify(v, f"{path}/{k}")
                        for k, v in tree.items()}
            return tree

        params = int8ify(params)
        cache = jax.eval_shape(lambda: init_kv_cache(statics.spec))
        args = dict(
            params=params,
            x_window=jnp.zeros((batch, n_chunks * 6, lat_h, lat_w, 16),
                               jnp.bfloat16),
            t=jnp.zeros((batch, n_chunks), jnp.float32),
            captions=jnp.zeros((batch, n_chunks, 800, 4096), jnp.bfloat16),
            caption_mask=jnp.ones((batch, n_chunks, 800), jnp.float32),
            cache=cache,
            slice_point=jnp.int32(5),
            kv_ranges=jnp.zeros((n_chunks, 2), jnp.int32),
            caption_dropout=jnp.zeros((batch,), bool),
        )
        fn = jax.jit(functools.partial(
            magi_forward, statics=statics, rope_tables=None,
            sync_kv_rows=batch == 2 and not per_chunk),
            donate_argnames=("cache",))
        try:
            m = analyze_program(fn, **{k: abstractify(v)
                                       for k, v in args.items()})
            used = m["temp_gib"] + m["argument_gib"] + 0.26 \
                + (m["output_gib"] - m["alias_gib"])
            results.append(dict(tp=tp, sp=sp, pp=pp, **{
                k: round(v, 2) for k, v in m.items()},
                used_gib=round(used, 2), fits=used <= HBM_GIB))
        except Exception as e:
            msg = str(e)
            results.append(dict(tp=tp, sp=sp, pp=pp,
                                error=msg[:400],
                                fits="Ran out of memory" not in msg))
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot", action="store_true")
    ap.add_argument("--per-chunk", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()
    if args.aot:
        out = aot(per_chunk=args.per_chunk, batch=args.batch)
    else:
        out = arith()
    for r in out:
        print(json.dumps(r))
