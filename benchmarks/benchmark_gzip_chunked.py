#!/usr/bin/env python
"""Chunked gzip benchmark (analog of ``benchmarks/benchmark_gzip_chunked.cu``).

Gzip provides decompression only (``README.md:16``): the harness stages
zlib-gzip-compressed inputs host-side and times the decode path; compression
throughput is reported as 0.
"""
import _bootstrap  # noqa: F401  (repo-root sys.path fix for direct runs)

import sys

from tpucomp.bench import main_template


def parse_opts(extra):
    assert not extra, f"unknown arguments: {extra}"
    return None


if __name__ == "__main__":
    main_template("gzip", sys.argv[1:], parse_opts)
