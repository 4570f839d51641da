"""Test config: CPU backend with 8 virtual devices (for mesh/sharding tests)
and float64 enabled (parity with the float64 TF1 reference).

This environment preloads jax at interpreter startup with JAX_PLATFORMS=axon
(the TPU tunnel), so env vars set here are too late for backend selection —
``jax.config.update('jax_platforms', ...)`` is the reliable switch as long as
it runs before the first backend use, which conftest import guarantees.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
