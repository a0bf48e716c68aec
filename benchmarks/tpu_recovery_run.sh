#!/bin/bash
# One-command round-5 measurement sweep (also the recovery path when the
# axon tunnel returns after an outage):
#   bash benchmarks/tpu_recovery_run.sh [results_dir]
# Ordered by artifact value so a late-returning tunnel still produces the
# most important tables first.  Everything uses the marginal chained
# protocol (BENCH_NOTES round-5).
set -u
OUT="${1:-results}"
mkdir -p "$OUT"
stamp=$(date +%Y%m%d_%H%M)

for ds in mixed mortgage; do
  echo "== pallas kernel report ($ds) ==" >&2
  timeout 5400 python benchmarks/pallas_kernel_report.py --mb 4 \
      --dataset "$ds" \
      --csv "$OUT/kernels_${ds}_r5.csv" \
      | tee "$OUT/kernels_${ds}_r5.txt"
done

echo "== r5 extra rows (zstd ladder, cascaded flagship) ==" >&2
timeout 3600 python benchmarks/r5_extra_measurements.py --csv "$OUT/r5_extra.csv"

for ds in realtext realfloat; do
  echo "== pallas kernel report ($ds) ==" >&2
  timeout 5400 python benchmarks/pallas_kernel_report.py --mb 4 \
      --dataset "$ds" \
      --csv "$OUT/kernels_${ds}_r5.csv" \
      | tee "$OUT/kernels_${ds}_r5.txt"
done

for ds in mixed mortgage; do
  echo "== HLIF benchmark ($ds) ==" >&2
  timeout 5400 python benchmarks/benchmark_hlif.py all --dataset "$ds" \
      --synthetic-mb 4 --csv "$OUT/hlif_${ds}_r5.csv"
done

echo "== device calibration (refresh) ==" >&2
timeout 1200 python benchmarks/calibrate.py --json "$OUT/calibration_r5.json"

echo "== headline bench ==" >&2
timeout 3600 python bench.py --mb 32 | tee "$OUT/bench_r5_$stamp.json"
