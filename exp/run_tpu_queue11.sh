#!/bin/bash
# Round-4 queue #11 (chains on queue10): diagnostics + quality.
#  - MAGI L4 layer-scaling control: if queue10's warm L34 number lands
#    near the 8.42 s round-2 record, nothing to do; if it lands ~28 s the
#    L4 control separates a real per-layer regression (L4 ~10x its 2.8 s
#    round-2 value) from whole-model HBM-pressure effects (L4 unchanged).
#    Runs twice: compile pass then the recorded fresh-process measure.
#  - QUALITY_r04 harness (adds the fused-act-quant delta).
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue10 done" exp/r6_results/queue10.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue11.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue11.log
}

run magi45b_l4_compile 2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_LAYERS=4 python -u exp/r4_magi45b_fwd.py
run magi45b_l4_warm    1800 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_LAYERS=4 python -u exp/r4_magi45b_fwd.py

run quality_r04        5400 python -u bench_quality.py

echo "queue11 done $(date)" | tee -a exp/r6_results/queue11.log
