#!/bin/bash
# Round-4 evidence queue, part f: N=1e6 retry with 64 MB leaf chunks,
# then the explicit-high accuracy/throughput rung at N=1e5.
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

run smooth_1e6_f 3600 python bench.py 1000000
run smooth_1e5_highpin 2400 env GEORGE_TPU_MATMUL_PRECISION=high python bench.py 100000
echo "QUEUE F DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
