#!/bin/bash
# Round-4 evidence queue, part c (fresh session; /tmp/jax_cache was cold).
# Sequential — never two TPU processes at once (serving-tunnel rule).
set -u
cd /root/repo
OUT=benchmarks/results_r04
mkdir -p "$OUT"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "--- $name rc=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
}

# 1. headline re-record (also warms the persistent compile cache)
run smooth_1e5 3000 python bench.py 100000
# 2. N=1e6 north star under the shipping config (min_size=512, refine=1,
#    double-single SMW cores)
run smooth_1e6 3600 python bench.py 1000000
# 3. qp variant throughput
run qp_1e5 3000 python bench.py 100000 qp
echo "QUEUE C DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
