#!/bin/bash
# Round-4 queue #7 (chains on queue6): the new fused-elementwise corners,
# the first MAGI base-config (cfg_number=3) measurement, and the on-chip
# VDE artifact. Serialized — one 16 GB chip. Warm-process protocol
# (BASELINE.md): the MAGI cfg3 program is new (~355 MB class), so it runs
# twice — the first invocation pays the compile and its numbers are
# DISCARDED; the second (fresh process, warm persistent cache) is the
# recorded number. The 1.3B r10 corners compile in seconds and are
# recorded directly.
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
