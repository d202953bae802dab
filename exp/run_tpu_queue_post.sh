#!/bin/bash
# Post-final queue: MAGI serving-config (per-chunk) op trace + the fused
# act-quant A/B rerun with the in-kernel erf fix.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue_final done" exp/r6_results/queue_final.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue_post.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue_post.log
}
run magi45b_pc_trace       2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_TRACE=1 python -u exp/r4_magi45b_fwd.py
run magi45b_pc_aq_compile  5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py
run magi45b_pc_aq_warm     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py
echo "queue_post done $(date)" | tee -a exp/r6_results/queue_post.log
