"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-device
sharding paths (parallel/) are exercised without TPU hardware — the moral
successor of the reference's `mpirun -np 4` single-host tests
(reference: test/CMakeLists.txt:8-19, test/mpiHydro/*).
"""
import os

# must be set before jax initializes its backends; force CPU even when the
# session environment points JAX at a TPU (tests exercise sharding on a
# virtual 8-device CPU mesh). The environment's TPU plugin re-writes
# jax_platforms at import time, so we override the config *after* import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_data_dir():
    """Path to the reference's shipped .ini corpus, if present."""
    path = "/root/reference/data"
    if not os.path.isdir(path):
        pytest.skip("reference data directory not available")
    return path
