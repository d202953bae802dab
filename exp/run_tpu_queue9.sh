#!/bin/bash
# Round-4 queue #9 (chains on queue8): second-wave re-measures + A/Bs.
#  - wan span corners: queue6's rerun STILL recompiled inside the timed
#    clip (the round-4 attention/cache edits changed the program hashes:
#    0.52/0.42 f/s is the same artifact again); programs are now compiled
#    at HEAD, this rerun is the real number.
#  - MAGI 4.5B fused act-quant A/B (MAGI_ACTQUANT=1): compile pass then
#    the recorded fresh-process measure.
#  - VAE decode engine A/B across conv impls (exp/r12_vae_conv.py decides
#    whether shifted_matmul is even a candidate; both engine numbers are
#    cheap to record regardless).
set -u
cd /root/repo
mkdir -p exp/r6_results
for i in $(seq 1 2880); do
  grep -q "queue8 done" exp/r6_results/queue8.log 2>/dev/null && break
  sleep 10
done
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue9.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue9.log
}

run wan_span_warm3       5400 python -u exp/r9_wan_span_warm.py

run magi45b_aq_compile   5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py
run magi45b_aq_warm      2700 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_ACTQUANT=1 python -u exp/r4_magi45b_fwd.py

run vae_decode_xla       3600 python -u exp/r4_vae_decode.py
run vae_decode_shifted   3600 env VAE_CONV=shifted_matmul python -u exp/r4_vae_decode.py

echo "queue9 done $(date)" | tee -a exp/r6_results/queue9.log
