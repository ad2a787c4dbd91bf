"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform/device-count env vars before JAX initializes its backends,
so this sits at conftest import time (pytest loads conftest before tests).
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box tunnels a real
# TPU chip; tests want the virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# Allow float64 in precision-parity tests (explicit fp32 arrays stay fp32).
jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
