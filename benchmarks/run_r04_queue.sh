#!/bin/bash
# Round-4 evidence queue: run every BASELINE measurement on the real chip,
# sequentially (never two TPU processes at once — serving-tunnel rule),
# each under a hard timeout, logging to benchmarks/results_r04/.
#
# The recorded artifacts are assembled into BENCH_extra_r04.json.
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

# 1. qp variant throughput (BASELINE config #3 kernel) — Missing #3
run qp_1e5 3000 python bench.py 100000 qp
# 2. N=1e6 under the shipping refine_steps=1 default — Missing #2 (north star)
run smooth_1e6 3000 python bench.py 1000000
# 3. NUTS samples/s/chip + divergence — Missing #1 (two rounds old)
run nuts_512 3000 python benchmarks/bench_nuts.py --n 512 --chains 8 --segment 8
# 4. 2-D on-chip: shakeout at default size, then the at-scale point
run hmatrix_2e4 2400 python benchmarks/bench_hmatrix.py --exact-truth
run hmatrix_1e5 3600 python benchmarks/bench_hmatrix.py --n 100000 --truth-n 16000 --exact-truth
# 5. headline re-record (cached compile)
run smooth_1e5 3000 python bench.py
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
