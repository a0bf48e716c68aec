#!/usr/bin/env python
"""Chunked zstd benchmark (analog of benchmarks/benchmark_zstd_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("zstd", sys.argv[1:])
