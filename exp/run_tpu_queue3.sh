#!/bin/bash
# Round-3 queue #3: donated-forward attribution + pad-free-allocation A/B.
# Waits for queue #2 to drain first (one chip; serialized).
set -u
cd /root/repo
mkdir -p exp/r6_results
# wait (up to ~90 min) for queue2 to finish
for i in $(seq 1 540); do
  grep -q "queue2 done" exp/r6_results/queue2.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue3.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue3.log
}

# 1. production-representative forward: donated cache (names the real
#    non-matmul residue — the plain probe's 280 ms includes ~18 ms of
#    defensive whole-cache copies that the engine's donation elides)
run fwd_donate       2400 python -u exp/r6_op_breakdown.py --donate
# 2. donated + pad-free allocation (the ~9 ms pad ops removed)
run fwd_donate_pad   2400 python -u exp/r6_op_breakdown.py --donate --allocpad
# 3. engine A/B: kv_alloc_pad flip decision
run alloc_pad_ab     5400 python -u exp/r8_alloc_pad.py

echo "queue3 done $(date)" | tee -a exp/r6_results/queue3.log
