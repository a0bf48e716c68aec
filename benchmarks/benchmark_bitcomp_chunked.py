#!/usr/bin/env python
"""Chunked bitcomp benchmark (analog of ``benchmarks/benchmark_bitcomp_chunked.cu``).

Per-format flags (``benchmark_bitcomp_chunked.cu:50,64-104``):
``-a`` 0 default / 1 sparse, ``-t`` data type — defaults ``{0, uchar}``.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

from tpucomp.bench import main_template
from tpucomp.constants import element_type_from_name
from tpucomp.formats.bitcomp import BitcompOpts


def parse_opts(extra):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("-a", "--algorithm", type=int, default=0, choices=[0, 1])
    ap.add_argument("-t", "--type", default="uchar")
    args, rest = ap.parse_known_args(extra)
    assert not rest, f"unknown arguments: {rest}"
    return BitcompOpts(algorithm_type=args.algorithm,
                       data_type=element_type_from_name(args.type))


if __name__ == "__main__":
    main_template("bitcomp", sys.argv[1:], parse_opts)
