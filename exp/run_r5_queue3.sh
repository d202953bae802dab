#!/bin/bash
# Round-5 TPU queue 3 — after queue 2. Decode re-measures with the FIXED
# middle-attention route (queue-2's decode/truestream carried the
# H=1-pathological Pallas route: 1584 ms/chunk vs 757 baseline), the MAGI
# scan-dispatch A/B, the interactive serving artifact, and QUALITY_r05.
cd /root/repo
R=exp/r6_results
set -x

# 1. whole-decode: chunked-attn route vs the 757.5 einsum baseline
VAE_CONV=xla       timeout 2400 python exp/r4_vae_decode.py > $R/q3_decode_xla.log 2>&1
VAE_CONV=halo_w8a8 timeout 2400 python exp/r4_vae_decode.py > $R/q3_decode_w8a8.log 2>&1
# T=6 (2 blocks per decode dispatch): latency/throughput trade row
VAE_CONV=halo_w8a8 timeout 2400 python exp/r4_vae_decode.py 6 > $R/q3_decode_w8a8_t6.log 2>&1
# 2. TRUE_STREAMING with the final lossless decode, then the w8a8 mode
timeout 2400 python exp/r4_truestream.py > $R/q3_truestream.log 2>&1
VAE_CONV=halo_w8a8 timeout 2400 python exp/r4_truestream.py > $R/q3_truestream_w8a8.log 2>&1

# 3. MAGI scan-dispatch A/B at the r60 geometry (per_chunk warm from q2)
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 MAGI_DISPATCH=scan \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q3_magi_r60_scan_compile.log 2>&1
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 MAGI_DISPATCH=scan \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q3_magi_r60_scan_final.log 2>&1
# full-size scan vs the 6.99 s/forward per-chunk record
MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 MAGI_DISPATCH=scan \
  timeout 6000 python exp/r4_magi45b_fwd.py > $R/q3_magi_r90_scan_compile.log 2>&1
MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 MAGI_DISPATCH=scan \
  timeout 6000 python exp/r4_magi45b_fwd.py > $R/q3_magi_r90_scan_final.log 2>&1

# 4. interactive serving artifact (SERVING_r05.json)
timeout 4800 python exp/r20_interactive_artifact.py > $R/q3_interactive.log 2>&1

# 5. quality gates incl. the w8a8 decode delta (QUALITY_r05.json)
timeout 4800 python bench_quality.py > $R/q3_quality.log 2>&1

grep -h -e ms_per_chunk -e pixel_frames_per_s -e fwd_s -e ttfb \
  -e max_metric $R/q3_*.log 2>/dev/null
echo QUEUE3_DONE
