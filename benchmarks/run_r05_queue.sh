#!/bin/bash
# Round-5 serialized TPU queue (never two TPU processes at once).
# Usage: bash benchmarks/run_r05_queue.sh <outdir> <job> [job ...]
# Jobs: nutsdiag | profileqp | bench1e6 | bench1e5 | benchqp | nuts512
set -u
OUT=${1:?outdir}
shift
mkdir -p "$OUT"
cd /root/repo

for job in "$@"; do
  echo "=== $job $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
  case "$job" in
    nutsdiag)
      timeout 3000 python benchmarks/diag_nuts_divergence.py --n 512 \
        > "$OUT/nutsdiag_chip.out" 2> "$OUT/nutsdiag_chip.err" ;;
    profileqp)
      timeout 3000 python benchmarks/profile_1e5.py 100000 qp \
        > "$OUT/profile_qp.out" 2> "$OUT/profile_qp.err" ;;
    profilesmooth)
      timeout 3000 python benchmarks/profile_1e5.py 100000 smooth \
        > "$OUT/profile_smooth.out" 2> "$OUT/profile_smooth.err" ;;
    bench1e6)
      timeout 3600 python bench.py 1000000 \
        > "$OUT/smooth_1e6.out" 2> "$OUT/smooth_1e6.err" ;;
    bench1e5)
      timeout 3000 python bench.py \
        > "$OUT/smooth_1e5.out" 2> "$OUT/smooth_1e5.err" ;;
    benchqp)
      timeout 3000 python bench.py 100000 qp \
        > "$OUT/qp_1e5.out" 2> "$OUT/qp_1e5.err" ;;
    nuts512)
      timeout 3000 python benchmarks/bench_nuts.py --n 512 --chains 8 \
        --segment 8 \
        > "$OUT/nuts_512.out" 2> "$OUT/nuts_512.err" ;;
    *)
      echo "unknown job $job" >> "$OUT/queue.log" ;;
  esac
  echo "=== done $job rc=$? $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
done
