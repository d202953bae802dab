#!/bin/bash
# Round-5 TPU queue 5 — long-video TRUE_STREAMING (pixels out, both decode
# modes) and the corrected-timing VDE artifact at HEAD (VDE_r05).
cd /root/repo
R=exp/r6_results
set -x

timeout 3600 python exp/r21_longvideo_stream.py > $R/q5_longstream_xla.log 2>&1
VAE_CONV=halo_w8a8 timeout 3600 python exp/r21_longvideo_stream.py > $R/q5_longstream_w8a8.log 2>&1
timeout 3600 python exp/r11_vde_artifact.py --out VDE_r05.json > $R/q5_vde.log 2>&1

grep -h -e sustained -e pixel $R/q5_*.log 2>/dev/null
echo QUEUE5_DONE
