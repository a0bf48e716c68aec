#!/usr/bin/env python
"""Render benchmark CSV results as charts (analog of
``benchmarks/generate_bar_charts.py``: ratio / compression / decompression
throughput bars).  Uses matplotlib when available; otherwise emits aligned
text bars so the tool works in minimal environments."""
import argparse
import csv
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_file", help="output of benchmark_all_formats.py -c")
    ap.add_argument("-o", "--output", default="benchmark_charts.png")
    args = ap.parse_args()

    rows = list(csv.DictReader(open(args.csv_file)))
    if not rows:
        sys.exit("no rows")
    fmts = [r.get("Format", f"row{i}") for i, r in enumerate(rows)]
    series = {
        "Compression ratio": [float(r["Compression ratio"]) for r in rows],
        "Compression GB/s": [float(r["Compression throughput (uncompressed) in GB/s"]) for r in rows],
        "Decompression GB/s": [float(r["Decompression throughput (uncompressed) in GB/s"]) for r in rows],
    }
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, (name, vals) in zip(axes, series.items()):
            ax.bar(fmts, vals)
            ax.set_title(name)
            ax.tick_params(axis="x", rotation=45)
        fig.tight_layout()
        fig.savefig(args.output, dpi=120)
        print(f"wrote {args.output}")
    except ImportError:
        for name, vals in series.items():
            print(f"\n{name}")
            peak = max(vals) or 1
            for f, v in zip(fmts, vals):
                bar = "#" * int(40 * v / peak)
                print(f"  {f:10s} {v:10.3f} {bar}")


if __name__ == "__main__":
    main()
