"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 test plan).

The environment may pre-import jax (axon platform plugin); jax backends
initialize lazily, so overriding the platform + XLA flags here still takes
effect as long as no backend has been touched yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual-device CPU backend, got "
        f"{jax.default_backend()}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
