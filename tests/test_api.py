"""Estimator API parity tests: construction defaults, fit/sample/dist/GoF
workflow (the reference notebook's flow), persistence artifacts, torch
checkpoint migration, and quirk replication."""

import warnings

import numpy as np
import pytest

from vgan_tpu import VGAN, VGAN_no_kl


def small_data(rng, n=96, d=10):
    cov = np.eye(d)
    for i in [0, 8, 9]:
        for j in [0, 8, 9]:
            if i != j:
                cov[i, j] = 0.9
    return rng.multivariate_normal(np.zeros(d), cov, size=n)


@pytest.fixture
def fitted_no_kl(rng):
    model = VGAN_no_kl(batch_size=32, epochs=2, lr=0.01, verbose=False)
    model.fit(small_data(rng))
    return model


def test_defaults_match_reference():
    m = VGAN()
    assert (m.batch_size, m.temperature, m.epochs) == (500, 0, 2000)
    assert (m.lr_G, m.lr_D, m.iternum_d, m.iternum_g) == (0.007, 0.007, 1, 5)
    assert (m.momentum, m.weight_decay) == (0.99, 0.04)
    # reference quirk: seed re-hardcoded to 777 (vgan.py:48)
    assert VGAN(seed=123).seed == 777
    assert VGAN(seed=123, replicate_reference_quirks=False).seed == 123

    m2 = VGAN_no_kl()
    assert (m2.batch_size, m2.epochs, m2.lr) == (500, 2000, 0.007)
    assert VGAN_no_kl(seed=123).seed == 123  # no_kl honors its seed


def test_no_kl_fit_history_and_state(fitted_no_kl):
    m = fitted_no_kl
    assert len(m.train_history["generator_loss"]) == 2
    assert all(np.isfinite(v) for v in m.train_history["generator_loss"])
    assert m.bandwidth is not None and m.bandwidth > 0
    assert m.generator_optimizer == "Adadelta"
    # batch_size clamped to train size rule
    m2 = VGAN_no_kl(batch_size=500, epochs=1, verbose=False)
    m2.fit(np.random.default_rng(0).normal(size=(40, 8)))
    assert m2.batch_size == 40


def test_generate_subspaces_deterministic_per_seed(fitted_no_kl):
    u1 = fitted_no_kl.generate_subspaces(16)
    u2 = fitted_no_kl.generate_subspaces(16)
    assert u1.shape == (16, 10) and u1.dtype == bool
    np.testing.assert_array_equal(u1, u2)  # re-seeded every call


def test_approx_subspace_dist(fitted_no_kl):
    fitted_no_kl.approx_subspace_dist(subspace_count=64)
    subs, proba = fitted_no_kl.subspaces, fitted_no_kl.proba
    assert subs.ndim == 2 and subs.shape[1] == 10
    np.testing.assert_allclose(proba.sum(), 1.0, rtol=1e-9)
    assert len(subs) == len(proba)


def test_approx_subspace_dist_leftover_quirk(fitted_no_kl):
    """Leftover mask lands at probability 0.5 (double-normalization quirk,
    vgan.py:376-382) whenever some feature is never selected."""
    m = fitted_no_kl
    m.approx_subspace_dist(subspace_count=64, add_leftover_features=True)
    if (m.subspaces[:-1].sum(axis=0) < 1).sum() != 0:
        np.testing.assert_allclose(m.proba[-1], 0.5, rtol=1e-9)


def test_check_if_myopic_frame(fitted_no_kl, rng):
    x = small_data(rng, n=80)
    df = fitted_no_kl.check_if_myopic(x, bandwidth=0.01, count=64, n_permutations=50)
    assert list(df.index) == ["p-val"]
    assert list(df.columns) == [0.01, "recommended bandwidth"]
    vals = df.to_numpy().ravel()
    assert np.all((0.0 <= vals) & (vals <= 1.0))


def test_check_if_myopic_count_assert(fitted_no_kl, rng):
    with pytest.raises(AssertionError):
        fitted_no_kl.check_if_myopic(small_data(rng, n=30), count=64)


def test_kl_fit_runs_and_alternates(rng):
    m = VGAN(batch_size=32, epochs=7, verbose=False)
    m.fit(small_data(rng, n=96))
    gh = m.train_history["generator_loss"]
    dh = m.train_history["detector_loss"]
    assert len(gh) == len(dh) == 7
    # epoch 0 is a detector epoch: generator loss is still NaN (parity)
    assert np.isnan(gh[0]) and np.isfinite(dh[0])
    # epochs 1..5 are generator epochs; epoch 6 detector again
    assert np.isfinite(gh[1]) and np.isfinite(dh[6])
    assert m.bandwidth is not None


def test_snapshot_artifacts(tmp_path, rng):
    m = VGAN_no_kl(batch_size=32, epochs=2, verbose=False,
                   path_to_directory=tmp_path / "run")
    m.fit(small_data(rng))
    run = tmp_path / "run"
    assert (run / "models" / "generator_0.msgpack").is_file()
    assert (run / "train_history" / "generator_loss_0.csv").is_file()
    assert (run / "params.csv").is_file()
    assert (run / "train_history.pdf").is_file()

    # second run increments the run number
    m2 = VGAN_no_kl(batch_size=32, epochs=1, verbose=False,
                    path_to_directory=run)
    m2.fit(small_data(rng))
    assert (run / "models" / "generator_1.msgpack").is_file()


def test_load_models_roundtrip(tmp_path, fitted_no_kl):
    path = fitted_no_kl._save_generator(tmp_path, 0, fitted_no_kl.generator_params)
    fresh = VGAN_no_kl(verbose=False)
    fresh.load_models(path, ndims=10)
    np.testing.assert_array_equal(
        fresh.generate_subspaces(8), fitted_no_kl.generate_subspaces(8)
    )


def test_load_models_from_torch_pt(tmp_path):
    import torch

    latent, d = 1, 10
    net = torch.nn.Sequential(
        torch.nn.Linear(latent, 2), torch.nn.Linear(2, 4),
        torch.nn.Linear(4, 8), torch.nn.Linear(8, d),
    )
    sd = {f"main.{i}.{k}": v for i in range(4) for k, v in net[i].state_dict().items()}
    pt = tmp_path / "generator_0.pt"
    torch.save(sd, pt)

    m = VGAN_no_kl(verbose=False)
    m.load_models(pt, ndims=d)
    u = m.generate_subspaces(12)
    assert u.shape == (12, d)


def test_get_params_keys(fitted_no_kl):
    keys = set(fitted_no_kl.get_params().keys())
    assert keys == {
        "batch size", "epochs", "lr_g", "momentum", "weight decay",
        "batch_size", "seed", "generator optimizer",
    }


def test_get_the_networks():
    m = VGAN()
    gen, det = m.get_the_networks(32, 2)
    assert gen.out_features == 32 and gen.latent_size == 2
    assert det.in_features == 32 and det.latent_size == 2


def test_count_runs_scans_indices(tmp_path):
    """Review finding: run counting by raw file count / files_per_run
    overwrites existing runs when foreign files or both estimator classes
    share a models/ directory. Now: one past the highest generator index."""
    from vgan_tpu.api.base import EstimatorBase

    models = tmp_path / "models"
    models.mkdir()
    assert EstimatorBase._count_runs(models, 2) == 0
    (models / "generator_0.msgpack").write_bytes(b"x")
    assert EstimatorBase._count_runs(models, 2) == 1  # not int(1/2)==0
    (models / "generator_3.msgpack").write_bytes(b"x")
    (models / "detector_3.msgpack").write_bytes(b"x")
    (models / "notes.txt").write_bytes(b"x")  # foreign file: ignored
    assert EstimatorBase._count_runs(models, 1) == 4


def test_ensemble_rejects_unknown_modes(rng):
    from vgan_tpu.ensemble import SubspaceEnsemble

    subs = np.ones((1, 4), bool)
    with pytest.raises(ValueError, match="aggregation"):
        SubspaceEnsemble(subs, np.ones(1), aggregation="avg")
    with pytest.raises(ValueError, match="normalize"):
        SubspaceEnsemble(subs, np.ones(1), normalize="z-score")
    with pytest.raises(ValueError, match="base"):
        SubspaceEnsemble(subs, np.ones(1), base="knnn")


def test_check_if_myopic_precise_uncapped_routes_tiled(fitted_no_kl, rng, monkeypatch):
    """Round 3: precision='float64' past the dense cap no longer degrades to
    the f32 screening sweep — it streams on device with f64 host reduction
    (cap monkeypatched small so CI exercises the route cheaply)."""
    import vgan_tpu.ops.mmd_test as mt
    from vgan_tpu.ops.pallas import gof_gram

    calls = []
    real = gof_gram.mmd_permutation_test_tiled_sweep

    def spy(*a, **kw):
        calls.append(kw.get("precision"))
        return real(*a, **kw)

    monkeypatch.setattr(mt, "DENSE_PRECISE_MAX_M", 32)
    monkeypatch.setattr(mt, "mmd_permutation_test_tiled_sweep", spy,
                        raising=False)
    # the route imports the symbol from gof_gram inside the function
    monkeypatch.setattr(gof_gram, "mmd_permutation_test_tiled_sweep", spy)

    x = small_data(rng, n=80)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the round-2 degradation warning is gone
        df = fitted_no_kl.check_if_myopic(
            x, bandwidth=0.01, count=64, n_permutations=40,
            precision="float64",
        )
    assert calls == ["float64"], calls
    vals = df.to_numpy().ravel()
    assert np.all((0.0 <= vals) & (vals <= 1.0))


def test_fit_rejects_invalid_input():
    import pytest

    from vgan_tpu import VGAN, VGAN_no_kl

    for cls in (VGAN_no_kl, VGAN):
        m = cls(epochs=1, verbose=False)
        with pytest.raises(ValueError, match="2-D"):
            m.fit(np.zeros(16))
        with pytest.raises(ValueError, match="2-D"):
            m.fit(np.zeros((0, 4)))
        bad = np.zeros((32, 4), np.float32)
        bad[3, 1] = np.nan
        with pytest.raises(ValueError, match="NaN/Inf"):
            m.fit(bad)
        with pytest.raises(ValueError, match="numeric"):
            m.fit(np.full((8, 2), "a"))


def test_fit_accepts_boolean_matrix(rng):
    """One-hot / binary feature matrices are a legitimate input class —
    cast to float32 rather than rejected by the dtype validation."""
    from vgan_tpu import VGAN_no_kl

    x = rng.uniform(size=(48, 4)) < 0.5
    m = VGAN_no_kl(epochs=1, batch_size=16, verbose=False)
    m.fit(x)  # must not raise
    assert np.isfinite(m.train_history["generator_loss"][-1])
