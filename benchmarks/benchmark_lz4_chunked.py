#!/usr/bin/env python
"""Chunked LZ4 benchmark (analog of ``benchmarks/benchmark_lz4_chunked.cu``).

Per-format flag: ``-t/--type`` — the ``nvcompBatchedLZ4Opts_t.data_type``
hint (``benchmark_lz4_chunked.cu:38-43``); chunk bytes must be a multiple of
the type size (``:48-84`` validator, enforced by tpucomp.batched).
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import argparse
import sys

from tpucomp.bench import main_template
from tpucomp.constants import element_type_from_name
from tpucomp.formats.lz4 import LZ4Opts


def parse_opts(extra):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("-t", "--type", default="char")
    args, rest = ap.parse_known_args(extra)
    assert not rest, f"unknown arguments: {rest}"
    return LZ4Opts(data_type=element_type_from_name(args.type))


if __name__ == "__main__":
    main_template("lz4", sys.argv[1:], parse_opts)
