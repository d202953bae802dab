#!/bin/bash
# First-real-pod measurement queue (VERDICT r4 item 4) — run UNATTENDED on
# an 8-chip v5e slice, start to finish. Every probe appends a JSON line to
# exp/pod_results/pod.jsonl; pass/fail criteria are pre-registered in
# exp/POD_RUNBOOK.md. Probes run strictly serially (device contention
# invalidates A/Bs).
#
# Plumbing validation without chips:  POD_VIRTUAL=8 bash exp/run_pod_queue.sh
cd /root/repo
P="python exp/pod_probe.py"
V="${POD_VIRTUAL:+POD_VIRTUAL=$POD_VIRTUAL}"
set -x

# 0. device census + sharded all-reduce
timeout 600  env $V $P sanity                    || echo "FAIL sanity"

# 1. Wan 1.3B sp scaling (target: >=80% tokens/s efficiency at sp=2/4)
timeout 3600 env $V $P wan_sp 1                  || echo "FAIL wan_sp 1"
timeout 3600 env $V $P wan_sp 2 ulysses          || echo "FAIL wan_sp 2"
timeout 3600 env $V $P wan_sp 2 ring_pass_q      || echo "FAIL wan_sp 2 ring"
timeout 3600 env $V $P wan_sp 4 ulysses          || echo "FAIL wan_sp 4"
# sp=8 ulysses is INVALID at 1.3B (12 heads % 8 != 0) — the sp=8 point
# rides the token-sharded ring instead
timeout 3600 env $V $P wan_sp 8 ring_pass_q      || echo "FAIL wan_sp 8"

# 2. MAGI 4.5B ulysses-vs-CSO A/B at sp=2 (pre-registered decision rule:
#    serve ulysses unless its a2a is >5% exposed in the trace)
timeout 7200 env $V $P magi_ab 2 ulysses         || echo "FAIL magi_ab uly"
timeout 7200 env $V $P magi_ab 2 cso             || echo "FAIL magi_ab cso"
timeout 7200 env $V TRACE=1 $P magi_ab 2 ulysses || echo "FAIL magi_ab trace"

# 2b. disaggregated TRUE_STREAMING: gen chip + dedicated decode chip(s);
#     pre-registered rule: interleaved block wall <= 1.15 * max(gen, decode)
timeout 3600 env $V $P disagg 1                  || echo "FAIL disagg 1"
timeout 3600 env $V $P disagg 2                  || echo "FAIL disagg 2"

# 3. 24B base-config bring-up on the two AOT-validated factorizations
timeout 10800 env $V $P magi24b 4 1 2            || echo "FAIL magi24b tp4xpp2"
timeout 10800 env $V $P magi24b 2 2 2            || echo "FAIL magi24b tp2sp2pp2"

echo POD_QUEUE_DONE
cat exp/pod_results/pod.jsonl
