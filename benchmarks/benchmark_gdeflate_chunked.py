#!/usr/bin/env python
"""Chunked gdeflate benchmark (analog of benchmarks/benchmark_gdeflate_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("gdeflate", sys.argv[1:])
