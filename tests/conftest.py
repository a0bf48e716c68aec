"""Test config: run on a hermetic 8-device CPU mesh.

The reference can only test multi-GPU paths on real hardware (SURVEY.md §4.7);
we get a hermetic multi-device story via XLA's host-platform device-count flag.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
