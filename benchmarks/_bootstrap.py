"""Make ``tpucomp`` importable when a benchmark script is run directly.

``python benchmarks/benchmark_lz4_chunked.py`` puts ``benchmarks/`` (not the
repo root) on ``sys.path``; this module prepends the parent directory so the
drivers work without an install or PYTHONPATH (mirrors the reference's
benchmarks being runnable straight out of the build tree).
"""
from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
