#!/bin/bash
# Round-5 TPU queue 1 — strictly serial (device contention invalidates
# A/Bs; the 07:53 xla decode rerun measured 908 ms purely because the r16
# trace ran concurrently).
cd /root/repo
R=exp/r6_results
set -x

# 1. whole-decode with the flash-routed middle attention (lossless change)
VAE_CONV=xla   timeout 2400 python exp/r4_vae_decode.py > $R/r16_decode_xla_flashattn.log 2>&1
# 2. w8a8 conv decode (lossy serving mode; stage model says -30% conv time)
VAE_CONV=halo_w8a8 timeout 2400 python exp/r4_vae_decode.py > $R/r16_decode_w8a8.log 2>&1
# 3. TRUE_STREAMING interleaved at HEAD (lossless default decode)
timeout 2400 python exp/r4_truestream.py > $R/r16_truestream_flashattn.log 2>&1
# 4. combined sub-1% corner A/B
timeout 3600 python exp/r18_combined_corner.py > $R/r18_combined_corner.log 2>&1
# 5. long-video 10x21 refresh at HEAD
timeout 3600 python exp/r3_longvideo_fast.py > $R/r18_longvideo_head.log 2>&1

grep -h -e ms_per_chunk -e pixel_frames_per_s -e frames_per_s -e sustained \
  $R/r16_decode_xla_flashattn.log $R/r16_decode_w8a8.log \
  $R/r16_truestream_flashattn.log $R/r18_combined_corner.log \
  $R/r18_longvideo_head.log 2>/dev/null
echo QUEUE1_DONE
