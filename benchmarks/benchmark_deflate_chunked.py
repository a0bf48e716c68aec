#!/usr/bin/env python
"""Chunked deflate benchmark (analog of benchmarks/benchmark_deflate_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("deflate", sys.argv[1:])
