"""Test harness: run everything on a virtual 8-device CPU platform so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4).

The environment's axon TPU plugin force-selects itself via
``jax.config.update('jax_platforms', 'axon,cpu')`` in sitecustomize, so setting the
JAX_PLATFORMS env var is not enough — we must re-update the config before any backend
client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
