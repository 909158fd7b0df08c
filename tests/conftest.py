"""Test config: run everything on a simulated 8-device CPU mesh.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): sharding
and collective logic is validated on virtual CPU devices; numerics parity
vs. numpy references is platform-independent. Must run before jax imports.
"""

import os
import sys

# FORCE cpu (the ambient env carries JAX_PLATFORMS=axon for the TPU tunnel;
# tests must run on the virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
# JAX's default matmul/conv precision is reduced (bf16-class) even on CPU;
# numeric-parity tests need true f32. NOTE: sitecustomize.py (axon site)
# imports jax at interpreter startup, so env flags are too late — use
# config.update after import.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
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
