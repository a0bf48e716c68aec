#!/usr/bin/env python
"""Chunked snappy benchmark (analog of ``benchmarks/benchmark_snappy_chunked.cu``).

``nvcompBatchedSnappyOpts_t`` is empty (benchmark_snappy_chunked.cu:31-36) — no per-format
flags; rejects any unknown arguments like the reference parser does.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import sys

from tpucomp.bench import main_template


def parse_opts(extra):
    assert not extra, f"unknown arguments: {extra}"
    return None


if __name__ == "__main__":
    main_template("snappy", sys.argv[1:], parse_opts)
