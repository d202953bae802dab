#!/bin/bash
# Round-5 TPU queue 3b — continuation of queue 3 (killed mid-truestream when
# the session ended). Step 1 (decode A/Bs) already landed:
#   xla 766.4 ms/chunk, halo_w8a8 478.5 ms/chunk (25.1 decode pixel f/s);
#   T=6 w8a8 OOM'd (RESOURCE_EXHAUSTED) — recorded as a capacity finding.
cd /root/repo
R=exp/r6_results
set -x

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
echo QUEUE3B_DONE
