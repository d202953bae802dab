#!/bin/bash
# Round-4 queue #7 (chains on queue6). FIRST: fresh-process re-measures of
# the MAGI span/nospan/head-major configs — queue3's "warm" runs
# recompiled in-process (the round-4 dispatcher/cache edits changed the
# program hashes: 28.8-30.5 s/fwd carries the documented 3-4x
# compiling-process inflation, exactly the round-3 32.5 s signature), so
# the programs are cached NOW and these reruns give the real numbers.
# Then the fused-elementwise corners, the first MAGI cfg3 measurement, and
# the on-chip VDE artifact. Serialized — one 16 GB chip.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2160); do
  grep -q "queue6 done" exp/r6_results/queue6.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue7.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue7.log
}

# fresh-process warm-cache re-measures (programs compiled by queue3's runs)
run magi45b_nospan_warm2 2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=0 python -u exp/r4_magi45b_fwd.py
run magi45b_span_warm2   2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_hm_warm2     2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py

# fused act-quant / MXU-rope / alloc-pad corners (donated 1.3B forward;
# baseline 259.8 ms = exp/r6_results/fwd_donate.log)
run r10_aq            2400 python -u exp/r10_act_quant.py --actquant
run r10_rope          2400 python -u exp/r10_act_quant.py --ropemxu
run r10_aq_rope       2400 python -u exp/r10_act_quant.py --actquant --ropemxu
run r10_all           2400 python -u exp/r10_act_quant.py --actquant --ropemxu --allocpad

# MAGI 4.5B base config (cfg_number=3): compile pass then the recorded
# fresh-process warm-cache measure
run magi45b_cfg3_compile 5400 env MAGI_WEIGHTS=int8 MAGI_CFG=3 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_cfg3_warm    2700 env MAGI_WEIGHTS=int8 MAGI_CFG=3 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py

# end-to-end VDE artifact at the 1.3B int8 serving config (writes
# VDE_r04.json at the repo root)
run vde_artifact      5400 python -u exp/r11_vde_artifact.py --clips 2

echo "queue7 done $(date)" | tee -a exp/r6_results/queue7.log
