"""Dataset utilities: loaders, synthetic families, format handling."""

import numpy as np
import pytest

from vgan_tpu.data import (
    correlated_gaussian,
    load_tabular,
    notebook_gaussian,
    sklearn_dataset,
)


def test_notebook_gaussian_shape_and_coupling():
    x = notebook_gaussian(n=2000, d=10, seed=0)
    assert x.shape == (2000, 10)
    # the notebook's covariance is not PSD, so numpy's sampler clips its
    # spectrum; coupling survives but only weakly — assert structure, not
    # strength (uncoupled pairs should sit near zero)
    c = np.corrcoef(x.T)
    coupled = [abs(c[i, j]) for i, j in [(0, 8), (0, 9), (8, 9)]]
    uncoupled = [abs(c[1, 2]), abs(c[3, 4]), abs(c[5, 6])]
    assert min(coupled) > max(uncoupled)


def test_correlated_gaussian_psd():
    x = correlated_gaussian(n=400, d=10, coupled=(1, 2), rho=0.9, seed=1)
    c = np.corrcoef(x[:, 1], x[:, 2])[0, 1]
    assert c > 0.8


def test_load_tabular_npy_npz(tmp_path):
    x = np.random.default_rng(0).normal(size=(20, 4))
    np.save(tmp_path / "a.npy", x)
    np.savez(tmp_path / "a.npz", data=x)
    np.testing.assert_allclose(load_tabular(tmp_path / "a.npy"), x)
    np.testing.assert_allclose(load_tabular(tmp_path / "a.npz"), x)
    with pytest.raises(ValueError, match="unsupported"):
        load_tabular(tmp_path / "a.parquet")


def test_sklearn_datasets():
    x, y = sklearn_dataset("digits")
    assert x.shape[1] == 64 and len(y) == len(x)
    with pytest.raises(ValueError, match="unknown dataset"):
        sklearn_dataset("mnist")


def test_load_adbench_contract(tmp_path, rng):
    """ADBench .npz loader: X/y keys, 0/1 labels (1 = anomaly), loud
    errors on malformed files (the real-data rows of the quality table —
    no network here, so users supply ADBench's files)."""
    import pytest

    from vgan_tpu.data import load_adbench

    x = rng.normal(size=(50, 7)).astype(np.float64)
    y = (rng.uniform(size=50) < 0.1).astype(np.int64)
    p = tmp_path / "toy_adb.npz"
    np.savez(p, X=x, y=y)
    x2, y2 = load_adbench(p)
    assert x2.dtype == np.float32 and x2.shape == (50, 7)
    np.testing.assert_array_equal(y2, y)

    np.savez(tmp_path / "bad1.npz", X=x)
    with pytest.raises(ValueError, match="missing key"):
        load_adbench(tmp_path / "bad1.npz")
    np.savez(tmp_path / "bad2.npz", X=x, y=np.arange(50))
    with pytest.raises(ValueError, match="0/1"):
        load_adbench(tmp_path / "bad2.npz")
    np.savez(tmp_path / "bad3.npz", X=x, y=y[:10])
    with pytest.raises(ValueError, match="disagree"):
        load_adbench(tmp_path / "bad3.npz")
