#!/usr/bin/env python
"""Chunked lz4 benchmark (analog of benchmarks/benchmark_lz4_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("lz4", sys.argv[1:])
