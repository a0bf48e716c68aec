#!/usr/bin/env python
"""Chunked gzip benchmark (analog of benchmarks/benchmark_gzip_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("gzip", sys.argv[1:])
