"""Test config: run everything on a simulated 8-device CPU mesh.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): sharding
and collective logic is validated on virtual CPU devices; numerics parity
vs. numpy references is platform-independent. Must run before jax imports.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
