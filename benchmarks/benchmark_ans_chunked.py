#!/usr/bin/env python
"""Chunked ans benchmark (analog of benchmarks/benchmark_ans_chunked.cu)."""
import sys
from tpucomp.bench import main_template

if __name__ == "__main__":
    main_template("ans", sys.argv[1:])
