"""Test harness config: force an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware.

The environment may pin JAX_PLATFORMS to a hardware backend (e.g. a
tunneled TPU) and re-force it from sitecustomize, so overriding the env var
is not enough — the jax config itself is updated before any backend is
initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
