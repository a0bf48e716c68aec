"""Tracing / profiling helpers — the NVTX + cudaEvent analog.

The reference wraps pipeline phases in NVTX ranges for Nsight
(``examples/nvcomp_gds.cu:127-242``) and times kernels with ``cudaEvent_t``
elapsed time plus a warmup-then-measure protocol
(``benchmarks/benchmark_template_chunked.cuh:436-462,841-846``).  TPU-side:

* :func:`annotate` — ``jax.profiler.TraceAnnotation`` context (shows up in
  xplane traces / Perfetto exactly like an NVTX range).
* :func:`timed` — wall-clock timing with ``block_until_ready`` fences (the
  ``cudaEventElapsedTime`` analog under XLA's async dispatch).
* :func:`trace_to` — capture a profiler trace directory for offline viewing.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named range visible in JAX profiler traces (NVTX-range analog)."""
    import jax.profiler
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: str) -> Iterator[None]:
    """Capture a profiler trace (view with XProf/TensorBoard)."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable[[], Any], iterations: int = 5,
          warmup: int = 1) -> tuple[float, Any]:
    """(best seconds, last result) with device fences; warmup excludes compile."""
    import jax
    result = None
    for _ in range(max(warmup, 1)):
        result = fn()
        jax.block_until_ready(result)
    best = float("inf")
    for _ in range(iterations):
        t0 = time.perf_counter()
        result = fn()
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result


def throughput_gbs(nbytes: int, seconds: float) -> float:
    return nbytes / seconds / 1e9 if seconds > 0 else float("inf")
