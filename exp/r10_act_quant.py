"""Round-4 donated-forward A/B: fused act-quant kernel + MXU rope.

Corners over (fused_act_quant x rope_mxu [x kv_alloc_pad]) at the 1.3B int8
full-cache production shape (donated cache — the real serving
configuration; baseline measured 259.8 ms, exp/r6_results/fwd_donate.log).
Targets the named elementwise costs from exp/r6_results/op_breakdown.log:
%fusion.317/318 (fc2-input gelu+quant chain, ~16 ms/fwd),
%multiply_reduce_fusion.{6,7,8} (linear-input quants, ~6 ms/fwd),
%subtract_convert_fusion.3 (rope pair-interleave, ~3 ms/fwd).

Run each corner in a FRESH process (the queue script does): one corner per
invocation, persistent compile cache carries the warm programs.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from r6_op_breakdown import build_step, timed  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--actquant", action="store_true")
    ap.add_argument("--ropemxu", action="store_true")
    ap.add_argument("--allocpad", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true")
    a = ap.parse_args()
    if a.tiny:
        jax.config.update("jax_platforms", "cpu")
    if a.actquant:
        from inferix_tpu.quant.api import set_fused_act_quant

        set_fused_act_quant(True)
    if a.ropemxu:
        from inferix_tpu.ops.rope import set_rope_impl

        set_rope_impl("mxu")
    step = build_step(donate=True, alloc_pad=a.allocpad, tiny=a.tiny)
    ms = timed(step, a.iters)
    print(json.dumps({
        "case": "forward_donated",
        "act_quant": a.actquant,
        "rope_mxu": a.ropemxu,
        "alloc_pad": a.allocpad,
        "ms": round(ms, 2),
    }))
