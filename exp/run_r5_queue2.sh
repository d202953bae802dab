#!/bin/bash
# Round-5 TPU queue 2 — clean reruns of everything queue 1 ran under CPU
# contention (pytest was live), plus the reduced-geometry MAGI cfg3
# measurement (VERDICT r4 item 2). STRICTLY serial; nothing else may run.
cd /root/repo
R=exp/r6_results
set -x

# 1. whole-decode: xla + flash middle-attn (lossless) vs halo_w8a8 (lossy)
VAE_CONV=xla       timeout 2400 python exp/r4_vae_decode.py > $R/q2_decode_xla.log 2>&1
VAE_CONV=halo_w8a8 timeout 2400 python exp/r4_vae_decode.py > $R/q2_decode_w8a8.log 2>&1
# 2. TRUE_STREAMING interleaved at HEAD
timeout 2400 python exp/r4_truestream.py > $R/q2_truestream.log 2>&1
# 3. combined sub-1% corner A/B (contended run said +1.11% — re-verify)
timeout 3600 python exp/r18_combined_corner.py > $R/q2_combined_corner.log 2>&1
# 4. long-video 10x21 refresh
timeout 3600 python exp/r3_longvideo_fast.py > $R/q2_longvideo.log 2>&1

# 5. MAGI cfg3 vs distilled at the SAME reduced geometry (480-class,
#    lat 60x60, fits one chip). Compile passes first (timings discarded),
#    fresh-process warm-cache measurements after.
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q2_magi_r60_cfg1_compile.log 2>&1
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=3 \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q2_magi_r60_cfg3_compile.log 2>&1
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=1 \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q2_magi_r60_cfg1_final.log 2>&1
MAGI_RES=60 MAGI_WEIGHTS=int8 MAGI_KV=int8 MAGI_CFG=3 \
  timeout 4800 python exp/r4_magi45b_fwd.py > $R/q2_magi_r60_cfg3_final.log 2>&1

grep -h -e ms_per_chunk -e pixel_frames_per_s -e frames_per_s -e sustained \
  -e fwd_s -e gain_pct $R/q2_*.log 2>/dev/null
echo QUEUE2_DONE
