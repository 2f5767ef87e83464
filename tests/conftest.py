"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that multi-chip sharding
logic is exercised without TPU hardware (the strategy called out in
SURVEY.md §4: impulse + gradcheck tests for the kernels against a pure-jnp
oracle, plus multi-device tests via ``xla_force_host_platform_device_count``).
"""

import os

# Must be set before jax is imported anywhere. The environment may preset
# JAX_PLATFORMS (e.g. to a TPU plugin platform), so force CPU unless the
# caller explicitly requests otherwise via SBMC_TEST_PLATFORM.
os.environ["JAX_PLATFORMS"] = os.environ.get("SBMC_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
