#!/bin/bash
# Round-3 on-chip A/B sweep (run AFTER training frees the chip; ONE TPU
# job at a time).  Results append to /tmp/sweep.log as labeled JSON lines.
cd /root/repo
L=/tmp/sweep.log
run() {  # run LABEL env... -- (bench args via env)
  local label="$1"; shift
  echo "== $label" >> $L
  env "$@" BENCH_ITERS=12 python bench.py 2>>/tmp/sweep.err >> $L
}

# 1. headline default (trained weights auto-load, 4-site keys-metric)
run default
# 2. hoisted attention
run hoist THMR_ATTN_HOIST=1
# 3. fused MLP
run fusedmlp THMR_FUSED_MLP=1
# 4. both
run hoist+fusedmlp THMR_ATTN_HOIST=1 THMR_FUSED_MLP=1
# 5. schedule ladder (keys metric)
run sched-off BENCH_MERGE=off
run sched-3site BENCH_MERGE=8:32,16:32,24:32
run sched-agg BENCH_MERGE=4:64,10:48,16:32,22:16
run sched-max BENCH_MERGE=4:80,10:48,16:24,20:16,26:8
# 6. x-metric comparison at default schedule (accuracy delta interest)
run metric-x BENCH_MERGE_METRIC=x
echo DONE >> $L
