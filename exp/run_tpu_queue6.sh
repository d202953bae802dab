#!/bin/bash
# Round-3 queue #6 (runs whenever hardware is free; safe to start any
# time — it waits for queue3): WARM fresh-process re-runs of the Wan
# span-grid engine corners. The r7_cache_layout corner runs measured
# 0.73-0.83 f/s with span_grid=ON — far too slow to be the ~3 extra
# pow2-bucket programs alone, and carrying the same compiling-process
# signature BASELINE.md documents for the MAGI 32.5 s run (the process
# that compiles a large program stays ~3-4x degraded). These corners
# re-run against the now-warm persistent cache; if the warm numbers beat
# engine_int8_tm, the "span_grid stays OFF for Wan" conclusion flips.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 1440); do
  grep -q "queue3 done" exp/r6_results/queue3.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue6.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue6.log
}

run wan_span_warm 5400 python -u exp/r9_wan_span_warm.py

echo "queue6 done $(date)" | tee -a exp/r6_results/queue6.log
