#!/bin/bash
# Round-4 evidence queue, part d: headline profile + precision lever +
# NUTS + 2-D on-chip points. Run AFTER run_r04c_queue.sh (one TPU
# process at a time — serving-tunnel rule).
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

# 1. per-stage profile of the 43 ms budget (VERDICT weak #1)
run profile_1e5 2400 python benchmarks/profile_1e5.py 100000
# 2. the precision lever: high sweeps + pinned-critical highest
#    (round-2 ladder: 1.5e-3 vs the 2e-3 anchor — bench enforces it)
run smooth_1e5_high 2400 env GEORGE_TPU_MATMUL_PRECISION=high python bench.py 100000
# 3. NUTS samples/s/chip + divergence (BASELINE row 3)
run nuts_512 3000 python benchmarks/bench_nuts.py --n 512 --chains 8 --segment 8
# 4. 2-D on-chip at-scale point
run hmatrix_1e5 3600 python benchmarks/bench_hmatrix.py --n 100000 --truth-n 16000 --exact-truth --skip-weak
echo "QUEUE D DONE $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
