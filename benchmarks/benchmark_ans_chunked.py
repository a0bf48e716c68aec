#!/usr/bin/env python
"""Chunked ans benchmark (analog of ``benchmarks/benchmark_ans_chunked.cu``).

``nvcompBatchedAnsOpts_t`` is empty (benchmark_ans_chunked.cu:32,40-49) — no per-format
flags; rejects any unknown arguments like the reference parser does.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import sys

from tpucomp.bench import main_template


def parse_opts(extra):
    assert not extra, f"unknown arguments: {extra}"
    return None


if __name__ == "__main__":
    main_template("ans", sys.argv[1:], parse_opts)
