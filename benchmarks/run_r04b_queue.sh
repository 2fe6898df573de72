#!/bin/bash
# Round-4 queue, part b: rerun the two bench sizes after the assembly-free
# refinement + logdet trace correction landed (b95af1b).
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
run smooth_1e6_b 3600 python bench.py 1000000
run smooth_1e5_b 3000 python bench.py
echo "QUEUE B DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
