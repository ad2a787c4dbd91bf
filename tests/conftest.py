"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform/device-count env vars before JAX initializes its backends,
so this sits at conftest import time (pytest loads conftest before tests).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Force CPU regardless of ambient platform plugins. NOTE: the env var
# JAX_PLATFORMS=cpu is NOT honored when the axon TPU plugin is installed
# (the plugin still registers and wins default_backend()); only the config
# update reliably pins the CPU backend. Must run before any backend use.
jax.config.update("jax_platforms", "cpu")
# Allow float64 in precision-parity tests (explicit fp32 arrays stay fp32).
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: test time is dominated by recompiles of the
# same fit/epoch programs across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh not active"

# Opt-in NaN tripwire for CI runs (SURVEY.md section 5): VGAN_TPU_DEBUG_NANS=1
# makes any NaN-producing primitive raise immediately.
if os.environ.get("VGAN_TPU_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
