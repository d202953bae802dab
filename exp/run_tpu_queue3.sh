#!/bin/bash
# Round-3 follow-up queue (replaces the separately-chained queue3/4/5):
# waits for queue2 to drain, then runs everything serially — one chip,
# no overlap. Ordered by information value:
#   1. donated-forward probes (the production non-matmul residue number)
#   2. pad-free-allocation engine A/B (kv_alloc_pad flip decision)
#   3. MAGI 4.5B WARM fresh-process re-measures. Protocol (BASELINE.md):
#      a process that just compiled the ~355 MB window program stays ~4x
#      inflated even in its warmup-then-time loop (round-2 evidence:
#      int8/int8 L34 26.9 s in the compiling process vs 8.42 s
#      fresh-process warm-cache, r2_results.jsonl:127-128; queue2's span
#      run shows the same signature at 32.5 s). The span/head-major
#      programs are in the persistent cache now, so fresh processes give
#      the real numbers; the nospan control separates span-grid cost
#      from engine drift vs the round-2 8.42 s record.
set -u
cd /root/repo
mkdir -p exp/r6_results
# wait up to 4 h for queue2 (worst case: 4 x 45-min steps remain)
for i in $(seq 1 1440); do
  grep -q "queue2 done" exp/r6_results/queue2.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue3.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue3.log
}

run fwd_donate          2400 python -u exp/r6_op_breakdown.py --donate
run fwd_donate_pad      2400 python -u exp/r6_op_breakdown.py --donate --allocpad
run alloc_pad_ab        5400 python -u exp/r8_alloc_pad.py
run magi45b_nospan      2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=0 python -u exp/r4_magi45b_fwd.py
run magi45b_span_warm   2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_hm_warm     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py

echo "queue3 done $(date)" | tee -a exp/r6_results/queue3.log
