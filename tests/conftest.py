"""Test configuration: force CPU with a virtual 8-device mesh so multi-chip
sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# Some environments register a TPU plugin that ignores JAX_PLATFORMS; pin the
# default device to CPU explicitly so tests are deterministic and runnable
# anywhere.  Multi-device tests use jax.devices("cpu") (8 virtual devices).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
