#!/bin/bash
# Round-3 TPU measurement queue (BASELINE.md "Round 3" section): run the
# moment the axon tunnel recovers, in priority order. Each step logs to
# exp/r6_results/ and a failure does not block the rest. The FIRST step is
# the official bench record (VERDICT round-2 item #1).
set -u
mkdir -p /root/repo/exp/r6_results
cd /root/repo
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a exp/r6_results/queue.log
  timeout "$tmo" "$@" > "exp/r6_results/$name.log" 2>&1
  echo "$name rc=$? ($(date +%H:%M:%S))" | tee -a exp/r6_results/queue.log
}

# 1. official perf record (warm cache: .jax_cache persists across rounds)
run bench            5400 python -u bench.py
# 2. dead-grid-step price + the shipped span-grid fix, MAGI + Wan shapes
run span_grid        3600 python -u exp/r5_span_grid.py
# 3. attention block-size sweep at both serving shapes
run attn_tune        5400 python -u exp/r6_attn_tune.py
# 4. the 39 ms attribution: elementwise ablation first (cheap), then trace
run ablate           3600 python -u exp/r6_op_breakdown.py --ablate
run op_breakdown     3600 python -u exp/r6_op_breakdown.py
# 4b. cache-layout A/B: token-major vs head-major (kernel fold copy cost);
#     the engine probes compile 2 fresh head-major programs — budget high
run cache_layout     9000 python -u exp/r7_cache_layout.py
# 5. 24B per-chip AOT memory table (chipless compile through the tunnel)
run mem24b           5400 python -u exp/r5_24b_mem.py --aot
# 6. MAGI 4.5B serving forward: span grids on vs off (vs round-2 8.42 s)
run magi45b_span     5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 python -u exp/r4_magi45b_fwd.py
run magi45b_nospan   5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=0 python -u exp/r4_magi45b_fwd.py
# 7. MAGI 4.5B with the head-major window cache (kernel-fold copy A/B)
run magi45b_hm       5400 env MAGI_WEIGHTS=int8 MAGI_SPAN=1 MAGI_HEAD_MAJOR=1 python -u exp/r4_magi45b_fwd.py
# 8. quality-delta harness (bf16 vs int8 from identical weights) -> QUALITY_r03
run quality          5400 python -u bench_quality.py

echo "queue done $(date)" | tee -a exp/r6_results/queue.log
