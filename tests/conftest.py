"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that multi-chip sharding
logic is exercised without TPU hardware (the strategy called out in
SURVEY.md §4: impulse + gradcheck tests for the kernels against a pure-jnp
oracle, plus multi-device tests via ``xla_force_host_platform_device_count``).
"""

import os

# Must be set before any jax backend initializes. A TPU-plugin
# sitecustomize may have already forced jax_platforms at interpreter
# startup, so setting the env var is not enough — override the config
# explicitly (before any backend is initialized).
_platform = os.environ.get("SBMC_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
