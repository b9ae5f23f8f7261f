"""Test configuration: 8 virtual CPU devices for sharding tests.

XLA_FLAGS must be set before jax initializes its backends.  We keep the
default platform list (the axon TPU plugin hangs when excluded via
JAX_PLATFORMS=cpu in this image) and instead pin computations to the CPU
backend with jax.default_device, which gives the same 8-device virtual mesh
the driver uses for multi-chip dry runs.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _default_cpu():
    with jax.default_device(jax.devices("cpu")[0]):
        yield
