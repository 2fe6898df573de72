#!/bin/bash
# Round-4 evidence queue, part e: headline under the anchor-verified
# precision auto-tier, then the HBM-fixed N=1e6 north star.
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

run smooth_1e5_auto 3000 python bench.py 100000
run smooth_1e6_fixed 3600 python bench.py 1000000
echo "QUEUE E DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
