#!/usr/bin/env python
"""Chunked snappy benchmark (analog of benchmarks/benchmark_snappy_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("snappy", sys.argv[1:])
