#!/bin/bash
# Round-4 queue #10 (chains on queue9): the FINAL warm fresh-process MAGI
# triple. queue7's "warm2" runs turned into compile passes once more (the
# act-fold refactor changed the jaxpr: reshape-then-gelu vs gelu-then-
# reshape); the traced code is FROZEN from ddb632b on, so these reruns hit
# the persistent cache and are the recorded numbers.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue9 done" exp/r6_results/queue9.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue10.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue10.log
}

run magi45b_nospan_final 2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=0 python -u exp/r4_magi45b_fwd.py
run magi45b_span_final   2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_hm_final     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py
run magi45b_cfg3_final   2700 env MAGI_WEIGHTS=int8 MAGI_CFG=3 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py

echo "queue10 done $(date)" | tee -a exp/r6_results/queue10.log
