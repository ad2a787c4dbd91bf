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
# NO persistent compilation cache. It used to be enabled here (it saved
# ~minutes of recompiles across suite runs), but XLA:CPU executable
# (de)serialization bakes in machine features and this box is a VM whose
# host CPU can change under it: observed 2026-08-18, cpu_aot_loader
# "+prefer-no-scatter not supported on the host ... SIGILL" followed by
# hard SEGFAULTS inside compilation_cache.get_executable_and_time (read of
# a stale entry) AND put_executable_and_time (write of a fresh one, same
# boot) on the large fit programs in test_train. A salted cache dir per
# CPU-flags fingerprint did not help — the serialize path itself crashes —
# so the cache stays off; the in-process jit cache is unaffected.

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
