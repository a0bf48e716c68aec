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
