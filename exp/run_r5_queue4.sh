#!/bin/bash
# Round-5 TPU queue 4 — upsample-impl 4-corner A/B (the phase-conv commit
# ran unmeasured and the first truestream with it regressed 7.857->7.318),
# the truestream rows at the decided routes, and the interactive serving
# artifact re-run fresh-process against the now-warm cache (the queue-3b
# run's first segment was a 292 s compile pass).
cd /root/repo
R=exp/r6_results
set -x

# 1. decode corners: {xla, halo_w8a8} x {repeat, phase}
VAE_CONV=xla       VAE_UPSAMPLE=repeat timeout 2400 python exp/r4_vae_decode.py > $R/q4_decode_xla_repeat.log 2>&1
VAE_CONV=xla       VAE_UPSAMPLE=phase  timeout 2400 python exp/r4_vae_decode.py > $R/q4_decode_xla_phase.log 2>&1
VAE_CONV=halo_w8a8 VAE_UPSAMPLE=repeat timeout 2400 python exp/r4_vae_decode.py > $R/q4_decode_w8a8_repeat.log 2>&1
VAE_CONV=halo_w8a8 VAE_UPSAMPLE=phase  timeout 2400 python exp/r4_vae_decode.py > $R/q4_decode_w8a8_phase.log 2>&1

# 2. truestream at the decided default (repeat) — lossless + w8a8
VAE_UPSAMPLE=repeat                    timeout 2400 python exp/r4_truestream.py > $R/q4_truestream_repeat.log 2>&1
VAE_CONV=halo_w8a8 VAE_UPSAMPLE=repeat timeout 2400 python exp/r4_truestream.py > $R/q4_truestream_w8a8_repeat.log 2>&1

# 3. interactive serving artifact, fresh process, warm cache
timeout 4800 python exp/r20_interactive_artifact.py > $R/q4_interactive_warm.log 2>&1

grep -h -e ms_per_chunk -e pixel_frames_per_s $R/q4_*.log 2>/dev/null
echo QUEUE4_DONE
