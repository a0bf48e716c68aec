#!/usr/bin/env python
"""Sweep all algorithms x datasets with per-dataset best configs.

Analog of ``benchmarks/benchmark_all_algorithms.sh`` (``:3-28`` per-dataset
cascaded/type config maps, ``:70-77`` GDeflate variants, ``:160-163``
algorithm x file sweep loop).  The reference's datasets (mortgage columns,
texture/geometry caches, silesia) map to synthetic analogs with the same
structure: sorted int64 columns, low-cardinality int columns, run-heavy
binary, text, and the mixed Silesia-like corpus; real files can be swept with
``--filename`` instead.

Output: the shared 11-column CSV (one row per algorithm x dataset), plus the
algorithm/dataset/config columns prepended.
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

import numpy as np

from tpucomp.bench import BenchResult, load_files, run_benchmark
from tpucomp.constants import element_type_from_name
from tpucomp.utils import synth


def _datasets(mb: int) -> dict[str, bytes]:
    n = mb << 20
    return {
        # mortgage-col0-long analog: sorted wide integers, hugely compressible
        "sorted_long": synth.sorted_ints(n, dtype=np.int64).tobytes(),
        # low-cardinality int column (the cascaded sweet spot)
        "lowcard_int": synth.low_cardinality_ints(n, dtype=np.int32).tobytes(),
        # texturecache analog: run-heavy binary
        "runs": synth.runs(n, seed=3).tobytes(),
        # text corpus
        "text": synth.text_like(n, seed=4).tobytes(),
        # silesia analog
        "mixed": synth.mixed_corpus(n, seed=42).tobytes(),
    }


def _cascaded_opts(r, d, b, t):
    from tpucomp.formats.cascaded import CascadedOpts
    return CascadedOpts(type=element_type_from_name(t), num_rles=r,
                        num_deltas=d, use_bp=bool(b))


# per-dataset best cascaded configs — the benchmark_all_algorithms.sh:3-28
# dataset->config map rebuilt for the synthetic analogs
CASCADED_CONFIG = {
    "sorted_long": (0, 1, 1, "longlong"),   # delta+bp on sorted columns
    "lowcard_int": (1, 0, 1, "int"),        # RLE+bp on low-cardinality
    "runs": (2, 0, 1, "uchar"),
    "text": (0, 0, 1, "uchar"),
    "mixed": (2, 1, 1, "uint"),
}

# lz4 data-type hints per dataset (benchmark_lz4_chunked.cu:38-43)
LZ4_TYPE = {"sorted_long": "uint", "lowcard_int": "uint"}


def _variants(fmt: str, ds: str):
    """(label, opts) variants per format — the .sh's gdeflate/bitcomp sweeps."""
    if fmt == "cascaded":
        r, d, b, t = CASCADED_CONFIG[ds]
        return [(f"cascaded r{r} d{d} b{b} {t}", _cascaded_opts(r, d, b, t))]
    if fmt == "lz4":
        from tpucomp.formats.lz4 import LZ4Opts
        t = LZ4_TYPE.get(ds, "char")
        return [(f"lz4 {t}", LZ4Opts(data_type=element_type_from_name(t)))]
    if fmt == "gdeflate":
        from tpucomp.formats.gdeflate import GdeflateOpts
        return [(f"gdeflate algo{a}", GdeflateOpts(algo=a)) for a in (0, 1, 2)]
    if fmt == "deflate":
        from tpucomp.formats.deflate import DeflateOpts
        return [(f"deflate algo{a}", DeflateOpts(algo=a)) for a in (0, 1)]
    if fmt == "bitcomp":
        from tpucomp.formats.bitcomp import BitcompOpts
        return [(f"bitcomp algo{a}", BitcompOpts(algorithm_type=a))
                for a in (0, 1)]
    return [(fmt, None)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--formats", nargs="*",
                    default=["lz4", "snappy", "cascaded", "gdeflate",
                             "deflate", "zstd", "ans", "bitcomp"])
    ap.add_argument("--datasets", nargs="*", default=None,
                    help="subset of the synthetic dataset names")
    ap.add_argument("-f", "--filename", action="append",
                    help="sweep real files instead of synthetic datasets")
    ap.add_argument("--mb", type=int, default=4, help="per-dataset size")
    ap.add_argument("-p", "--page-size", type=int, default=65536)
    ap.add_argument("-i", "--iteration-count", type=int, default=3)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas"])
    args = ap.parse_args(argv)

    if args.filename:
        data = {fn: open(fn, "rb").read() for fn in args.filename}
    else:
        data = _datasets(args.mb)
        if args.datasets:
            data = {k: v for k, v in data.items() if k in args.datasets}

    print("algorithm,dataset," + BenchResult.CSV_HEADER)
    for ds, buf in data.items():
        chunks = [buf[o:o + args.page_size]
                  for o in range(0, len(buf), args.page_size)]
        for fmt in args.formats:
            for label, opts in _variants(fmt, ds):
                res = run_benchmark(fmt, chunks, opts=opts,
                                    chunk_size=args.page_size,
                                    iterations=args.iteration_count,
                                    backend=args.backend)
                print(f"{label},{ds}," + res.csv_row())
                sys.stdout.flush()


if __name__ == "__main__":
    main()
