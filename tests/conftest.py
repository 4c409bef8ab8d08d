"""Test configuration: force an 8-virtual-device CPU backend.

Mirrors the SURVEY §4 test-strategy recommendation: all tests run without a
TPU, and sharding/collective tests exercise a real multi-device mesh via
``--xla_force_host_platform_device_count``. float64 is enabled so golden
parity tests against the reference's numpy formulas are bit-meaningful.

The interpreter in this environment pre-imports jax with a TPU platform
selected, so env vars alone are too late — but backends initialize lazily,
so ``jax.config.update`` before first device use still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
