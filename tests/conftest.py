"""Test harness: force an 8-device CPU mesh before JAX backends initialize.

This environment preloads JAX with JAX_PLATFORMS=axon (a tunneled real
TPU); running unit tests through that tunnel is pathologically slow, so
tests run on virtual CPU devices instead. Multi-chip sharding logic is
validated on the 8 fake devices (SURVEY.md §4); the real-TPU path is
exercised by bench.py / the driver.

jax is typically already imported by sitecustomize here, but its backends
are not yet initialized, so jax.config.update is still effective.
"""

import os
import sys

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
    return np.random.default_rng(0)
