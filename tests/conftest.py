"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(`jax.sharding.Mesh` over a 'data' axis) is exercised without TPU hardware —
the standard JAX idiom for testing SPMD code (SURVEY.md §4). Must run before
jax initializes its backends, hence the env mutation at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image's sitecustomize registers the remote-TPU ("axon") backend at
# interpreter start and pins jax_platforms to it; override to CPU before any
# backend is initialized so tests get the 8 virtual devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
