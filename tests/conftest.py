"""Test config: run everything on a simulated 8-device CPU mesh.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): sharding
and collective logic is validated on virtual CPU devices; numerics parity
vs. numpy references is platform-independent. Must run before jax imports.
"""

import os
import sys

# FORCE cpu (the ambient env carries JAX_PLATFORMS=axon for the TPU tunnel;
# tests must run on the virtual 8-device CPU mesh). NOTE: sitecustomize.py
# (axon site) imports jax at interpreter startup, so setting JAX_PLATFORMS
# via env here is TOO LATE — must use config.update after import. XLA_FLAGS
# is read at backend-client creation, so setting it post-import still works
# as long as no jax op has run yet.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# JAX's default matmul/conv precision is reduced (bf16-class) even on CPU;
# numeric-parity tests need true f32.
jax.config.update("jax_default_matmul_precision", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# HARD-ASSERT the substrate (VERDICT r1 weak #3): if the suite silently runs
# on the 1-chip TPU, every "8-device mesh" test degrades to a 1-device mesh
# and tests nothing about sharding. Fail loudly instead.
assert jax.default_backend() == "cpu", (
    f"test suite must run on the virtual CPU mesh, got backend "
    f"{jax.default_backend()!r} — the axon plugin won the platform race")
assert jax.device_count() == 8, (
    f"test suite needs 8 virtual CPU devices, got {jax.device_count()} — "
    f"XLA_FLAGS was applied too late (backend already initialized?)")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
