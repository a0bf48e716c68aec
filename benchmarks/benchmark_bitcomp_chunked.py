#!/usr/bin/env python
"""Chunked bitcomp benchmark (analog of benchmarks/benchmark_bitcomp_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("bitcomp", sys.argv[1:])
