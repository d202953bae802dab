#!/bin/bash
# Round-3 (continued session) TPU queue: the steps the first queue never
# finished before the round snapshot — ablate re-run (OOM fixed in
# f6bf142), op-breakdown trace, MAGI 4.5B span/head-major A/B, 24B AOT
# memory table, quality harness. Serial: one chip, no HBM contention.
set -u
mkdir -p /root/repo/exp/r6_results
cd /root/repo
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue2.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue2.log
}

# 1. the 39 ms attribution (OOM fix landed post-first-attempt)
run ablate2          2400 python -u exp/r6_op_breakdown.py --ablate
# 2. profiler-trace op breakdown
run op_breakdown     2400 python -u exp/r6_op_breakdown.py
# 3. MAGI 4.5B serving forward: span grid on (shipped default)
run magi45b_span     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
# 4. MAGI 4.5B head-major window cache confirmation
run magi45b_hm       2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py
# 5. 24B per-chip AOT memory table (chipless compile through the tunnel)
run mem24b           2700 python -u exp/r5_24b_mem.py --aot
# 6. quality-delta harness (bf16 vs int8, identical weights) -> QUALITY_r03
run quality          2700 python -u bench_quality.py
# 7. finish the attention block-size sweep (first attempt cut at 2 rows)
run attn_tune2       2700 python -u exp/r6_attn_tune.py

echo "queue2 done $(date)" | tee -a exp/r6_results/queue2.log
