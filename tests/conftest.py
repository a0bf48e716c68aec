"""Test config: run on a hermetic 8-device CPU mesh.

The reference can only test multi-GPU paths on real hardware (SURVEY.md §4.7);
we get a hermetic multi-device story via XLA's host-platform device-count flag.

NOTE: this container's sitecustomize force-registers the ``axon`` remote-TPU
backend and sets ``jax_platforms="axon,cpu"`` at interpreter start, so the env
var alone is not enough — we must override the jax config after import.  Unit
tests must never run over the TPU tunnel (slow remote compiles, shared device).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# XLA:CPU compile memory is never returned: a single-process full-suite run
# grows ~220 MB -> ~5.8 GB RSS over ~13 min and then SEGFAULTS inside native
# compilation (exit 139, stack ends in jax _compile_and_write_cache -> LLVM)
# — an allocation failure mishandled in the compiler, not a kernel bug.
# Dropping the jit caches every N tests releases the executables and keeps
# RSS bounded, which lets a single process survive the whole suite; the
# xdist sharding in pyproject remains as the fast path.
_TESTS_PER_CACHE_CLEAR = 25
_test_counter = [0]


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _test_counter[0] += 1
    if _test_counter[0] % _TESTS_PER_CACHE_CLEAR == 0:
        jax.clear_caches()
