#!/usr/bin/env python
"""Sweep every registered format over a corpus (benchmark_all_algorithms.sh analog)."""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

from tpucomp import batched
from tpucomp.bench import BenchResult, load_files, run_benchmark
from tpucomp.utils import synth

ap = argparse.ArgumentParser()
ap.add_argument("-f", "--filename", action="append")
ap.add_argument("-p", "--page-size", type=int, default=65536)
ap.add_argument("--synthetic-mb", type=int, default=8)
ap.add_argument("-c", "--csv-output", action="store_true")
args = ap.parse_args()

if args.filename:
    chunks = load_files(args.filename, args.page_size, False)
else:
    buf = synth.mixed_corpus(args.synthetic_mb << 20, seed=42).tobytes()
    chunks = [buf[o:o + args.page_size] for o in range(0, len(buf), args.page_size)]

if args.csv_output:
    print("Format," + BenchResult.CSV_HEADER)
for fmt in batched.formats():
    spec = batched._get(fmt)
    if spec.decompression_only:
        continue
    try:
        res = run_benchmark(fmt, chunks, chunk_size=args.page_size)
        if args.csv_output:
            print(f"{fmt}," + res.csv_row())
        else:
            print(f"==== {fmt} ====")
            print(res.human())
    except Exception as e:  # noqa: BLE001
        print(f"{fmt}: FAILED {e}", file=sys.stderr)
