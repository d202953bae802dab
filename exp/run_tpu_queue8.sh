#!/bin/bash
# Round-4 queue #8 (chains on queue7): 24B AOT with the per-chunk window
# dispatch (the round-4 memory lever), and the VAE conv-formulation probe.
# AOT jobs only use the tunnel's compile helper (no HBM) but are serialized
# behind the measurement queues so their compile load can't perturb
# timings.
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue7 done" exp/r6_results/queue7.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue8.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue8.log
}

# 24B base config (cfg3, batch 2) with per-chunk dispatch across the
# factorizations; then the distilled (batch 1) 8-chip confirmations
run mem24b_perchunk      7200 python -u exp/r5_24b_mem.py --aot --per-chunk
run mem24b_perchunk_b1   7200 python -u exp/r5_24b_mem.py --aot --per-chunk --batch 1
# whole-window distilled b1 for comparison (the round-3 8-chip claim)
run mem24b_whole_b1      7200 python -u exp/r5_24b_mem.py --aot --batch 1

# VAE conv formulation probe (15 min)
run r12_vae_conv         2400 python -u exp/r12_vae_conv.py

echo "queue8 done $(date)" | tee -a exp/r6_results/queue8.log
