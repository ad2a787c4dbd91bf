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


# ---------------------------------------------------------------------------
# Fast smoke tier (round-3 VERDICT item 8): `pytest -m fast` runs one quick,
# representative test per subsystem in well under 2 minutes on the degraded
# 1-vCPU CI host — the pre-commit check; the full suite stays the CI gate.
# Kept HERE (not as decorators) so the tier is one auditable list.
# ---------------------------------------------------------------------------
_FAST_TESTS = {
    "tests/test_activations.py::test_binarize_mask",
    "tests/test_adadelta.py::test_adadelta_traced_mask",
    "tests/test_api.py::test_defaults_match_reference",
    "tests/test_api.py::test_no_kl_fit_history_and_state",
    "tests/test_checkpoint.py::test_checkpoint_class_mismatch_rejected",
    "tests/test_cli.py::test_unknown_subcommand_fails",
    "tests/test_data.py::test_load_tabular_npy_npz",
    "tests/test_ensemble.py::test_median_aggregation",
    "tests/test_io_native.py::test_csv_parity",
    "tests/test_lockstep.py::test_no_kl_lockstep_five_steps",
    "tests/test_mmd.py::test_pairwise_sq_dists_matches_naive",
    "tests/test_mmd_test.py::test_statistic_matches_naive",
    "tests/test_models.py::test_generator_big_shapes_and_widths",
    "tests/test_pallas_gram.py::test_forward_matches_jnp",
    "tests/test_parallel.py::test_feature_sharded_mmd_matches",
    "tests/test_serving.py::test_export_load_roundtrip",
    "tests/test_train.py::test_no_kl_epoch_runs_and_freezes_bandwidth",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid.split("[")[0] in _FAST_TESTS:
            item.add_marker(pytest.mark.fast)
