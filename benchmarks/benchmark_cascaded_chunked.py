#!/usr/bin/env python
"""Chunked cascaded benchmark (analog of ``benchmarks/benchmark_cascaded_chunked.cu``).

Per-format flags (``benchmark_cascaded_chunked.cu:38-80``):
``-r`` num_RLEs, ``-d`` num_deltas, ``-b`` use_bp, ``-t`` data type —
defaults ``{2, 1, 1, uint}`` like ``nvcompBatchedCascadedDefaultOpts``.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

from tpucomp.bench import main_template
from tpucomp.constants import element_type_from_name
from tpucomp.formats.cascaded import CascadedOpts


def parse_opts(extra):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("-r", "--num-rles", type=int, default=2)
    ap.add_argument("-d", "--num-deltas", type=int, default=1)
    ap.add_argument("-b", "--num-bps", type=int, default=1)
    ap.add_argument("-t", "--type", default="uint")
    args, rest = ap.parse_known_args(extra)
    assert not rest, f"unknown arguments: {rest}"
    return CascadedOpts(type=element_type_from_name(args.type),
                        num_rles=args.num_rles, num_deltas=args.num_deltas,
                        use_bp=bool(args.num_bps))


if __name__ == "__main__":
    main_template("cascaded", sys.argv[1:], parse_opts)
