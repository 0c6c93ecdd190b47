"""Test configuration: force CPU with a virtual 8-device mesh so multi-chip
sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Child processes (subprocess-based tests: launchers, sweep drivers,
# multi-process smoke) must not register the TPU plugin either — its
# sitecustomize keys on this variable, and a registered-but-unreachable
# plugin hangs backend init for the whole process.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# Some environments register a TPU plugin at interpreter startup and set the
# jax_platforms *config* (which overrides the JAX_PLATFORMS env var) to
# include it; force it back to cpu so backend init can't block on
# unreachable hardware.  Multi-device tests use jax.devices("cpu")
# (8 virtual devices).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
