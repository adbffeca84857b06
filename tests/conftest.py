"""Test config: run everything on CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py / the driver; unit tests must be
hermetic and fast, and the virtual 8-device CPU mesh is how multi-chip
sharding is validated without hardware (see repo instructions).
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-overrides jax_platforms at import time, so the
# env var alone is not enough — pin the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
