#!/bin/bash
# Round-4 FINAL queue (replaces queues 8-11; chains on queue7): everything
# remaining, ordered by decision value. Serialized — one 16 GB chip; the
# warm-process protocol (BASELINE.md) applies: every NEW program runs a
# compile pass whose timing is discarded, then a fresh-process measure.
#
# Context for readers: the rope_mxu default flipped ON mid-round (donated
# fwd 247.8 vs 259.8 ms, exp/r6_results/r10_rope.log), so every Wan
# program recompiles once; the MAGI programs are UNCHANGED since ddb632b
# (the queue7 "warm2" runs were their compile passes), so the *_final runs
# here are true fresh-process warm-cache numbers.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue7 done" exp/r6_results/queue7.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue_final.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue_final.log
}

# 1. fused act-quant corners with the FIXED AdaLN kernel (rope is default
#    now, so --actquant == aq+rope; baseline rope-only = 247.76 ms)
run r10_aq_fixed       2400 python -u exp/r10_act_quant.py --actquant
run r10_all_fixed      2400 python -u exp/r10_act_quant.py --actquant --allocpad

# 2. bench with the new defaults (pre-runs the driver's end-of-round bench
#    so its programs are warm), then the act-quant flagged bench (the last
#    flip decision)
run bench_default      5400 python -u bench.py
run bench_aq           5400 env INFERIX_BENCH_FLAGS='{"fused_act_quant": true}' python -u bench.py

# 3. MAGI finals: true warm fresh-process numbers (programs compiled by
#    queue7's passes; MAGI traced code frozen since ddb632b)
run magi45b_nospan_final 2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=0 python -u exp/r4_magi45b_fwd.py
run magi45b_span_final   2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_hm_final     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py
# cfg3 whole-window batch-2 failed the compile helper (HTTP 500, queue7) —
# the per-chunk dispatch is the configuration that compiles AND the 24B
# plan's dispatch mode; compile pass then measure. The distilled per-chunk
# pair quantifies the dispatch cost vs whole-window on the same hardware.
run magi45b_cfg3_pc_compile 5400 env MAGI_WEIGHTS=int8 MAGI_CFG=3 MAGI_SPAN=1 MAGI_DISPATCH=per_chunk python -u exp/r4_magi45b_fwd.py
run magi45b_cfg3_pc_final   2700 env MAGI_WEIGHTS=int8 MAGI_CFG=3 MAGI_SPAN=1 MAGI_DISPATCH=per_chunk python -u exp/r4_magi45b_fwd.py
run magi45b_pc_compile      5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_DISPATCH=per_chunk python -u exp/r4_magi45b_fwd.py
run magi45b_pc_final        2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_DISPATCH=per_chunk python -u exp/r4_magi45b_fwd.py

# 4. MAGI fused act-quant A/B (compile pass then measure)
run magi45b_aq_compile 5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py
run magi45b_aq_warm    2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py

# 5. Wan span-grid corners (compile pass + measure — the rope flip
#    invalidated the earlier compiles)
run wan_span_compile   5400 python -u exp/r9_wan_span_warm.py
run wan_span_final     5400 python -u exp/r9_wan_span_warm.py

# 6. VAE decode A/B across conv impls
run vae_decode_xla     3600 python -u exp/r4_vae_decode.py
run vae_decode_shifted 3600 env VAE_CONV=shifted_matmul python -u exp/r4_vae_decode.py
run r12_vae_conv       2400 python -u exp/r12_vae_conv.py

# 7. 24B AOT with the per-chunk window dispatch (compile-helper only)
run mem24b_perchunk    7200 python -u exp/r5_24b_mem.py --aot --per-chunk
run mem24b_perchunk_b1 7200 python -u exp/r5_24b_mem.py --aot --per-chunk --batch 1

# 8. MAGI L4 layer-scaling control (bisects any L34 regression) + quality
run magi45b_l4_compile 2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_LAYERS=4 python -u exp/r4_magi45b_fwd.py
run magi45b_l4_warm    1800 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_LAYERS=4 python -u exp/r4_magi45b_fwd.py
run quality_r04        5400 python -u bench_quality.py

echo "queue_final done $(date)" | tee -a exp/r6_results/queue_final.log
