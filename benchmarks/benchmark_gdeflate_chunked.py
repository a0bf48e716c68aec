#!/usr/bin/env python
"""Chunked GDeflate benchmark (analog of ``benchmarks/benchmark_gdeflate_chunked.cu``).

Per-format flag: ``-a/--algorithm`` — 0 high-throughput, 1 high-compression,
2 entropy-only (``benchmark_gdeflate_chunked.cu:42,55-58``).
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

from tpucomp.bench import main_template
from tpucomp.formats.gdeflate import GdeflateOpts


def parse_opts(extra):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("-a", "--algorithm", type=int, default=0, choices=[0, 1, 2])
    args, rest = ap.parse_known_args(extra)
    assert not rest, f"unknown arguments: {rest}"
    return GdeflateOpts(algo=args.algorithm)


if __name__ == "__main__":
    main_template("gdeflate", sys.argv[1:], parse_opts)
