#!/usr/bin/env python
"""Chunked cascaded benchmark (analog of benchmarks/benchmark_cascaded_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("cascaded", sys.argv[1:])
