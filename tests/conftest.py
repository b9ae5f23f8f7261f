"""Test configuration: 8 virtual CPU devices for sharding tests.

XLA_FLAGS must be set before jax initializes its backends.  We keep the
default platform list (the axon TPU plugin hangs when excluded via
JAX_PLATFORMS=cpu in this image) and instead pin computations to the CPU
backend with jax.default_device, which gives the same 8-device virtual mesh
the driver uses for multi-chip dry runs.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# keep prove() on its host/numpy path in the suite; the device pipeline is
# exercised explicitly (tests/test_device_prover.py) on the CPU backend
os.environ.setdefault("RSTPU_DEVICE_PROVER", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# persistent compilation cache: the multi-device mesh tests compile the full
# verifier program several times; cache hits make re-runs minutes faster
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _default_cpu():
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def pytest_configure(config):
    # two CI tiers (VERDICT r2 #10): fast = fields/poseidon/cs/verifier/
    # gadgets/serialize (`-m "not slow"`, ~2 min warm); slow = prover/
    # recursion/mesh/flavor round-trips (nightly-style).
    config.addinivalue_line(
        "markers", "slow: heavy prover/recursion/mesh tier"
    )
