#!/bin/bash
# One-command measurement sweep for when the axon tunnel returns:
#   bash benchmarks/tpu_recovery_run.sh [results_dir]
# Produces the round's missing TPU numbers: per-kernel validation +
# throughput on both corpora, then the headline bench JSON.
set -u
OUT="${1:-results}"
mkdir -p "$OUT"
stamp=$(date +%Y%m%d_%H%M)

echo "== pallas kernel report (mixed corpus) ==" >&2
timeout 3600 python benchmarks/pallas_kernel_report.py --mb 4 \
    --csv "$OUT/kernels_mixed_$stamp.csv" \
    | tee "$OUT/kernels_mixed_$stamp.txt"

echo "== pallas kernel report (mortgage headline corpus) ==" >&2
timeout 3600 python benchmarks/pallas_kernel_report.py --mb 4 \
    --dataset mortgage \
    --csv "$OUT/kernels_mortgage_$stamp.csv" \
    | tee "$OUT/kernels_mortgage_$stamp.txt"

echo "== headline bench ==" >&2
timeout 3600 python bench.py --mb 16 | tee "$OUT/bench_$stamp.json"
