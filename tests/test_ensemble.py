"""Subspace-ensemble OD: native scorers vs sklearn/numpy oracles, ensemble
aggregation semantics, and outlier-detection sanity end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from vgan_tpu.ensemble import (
    SubspaceEnsemble,
    knn_scores_masked,
    lof_scores_masked,
    mean_dist_scores_masked,
)


def test_knn_scores_match_numpy(rng):
    xtr = rng.normal(size=(50, 8)).astype(np.float32)
    xte = rng.normal(size=(20, 8)).astype(np.float32)
    mask = np.zeros(8, bool)
    mask[[1, 3, 4]] = True
    k = 5

    ours = np.asarray(knn_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k))
    d = np.sqrt(((xte[:, None, mask] - xtr[None, :, mask]) ** 2).sum(-1))
    expected = np.sort(d, axis=1)[:, k - 1]
    np.testing.assert_allclose(ours, expected, rtol=1e-5)

    ours_mean = np.asarray(
        mean_dist_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k)
    )
    np.testing.assert_allclose(ours_mean, np.sort(d, axis=1)[:, :k].mean(1), rtol=1e-5)


def test_lof_scores_match_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.neighbors")
    xtr = rng.normal(size=(60, 5)).astype(np.float32)
    xte = rng.normal(size=(25, 5)).astype(np.float32)
    xte[:5] += 4.0  # clear outliers
    mask = np.ones(5, bool)
    k = 10

    ours = np.asarray(
        lof_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k)
    )
    lof = sklearn.LocalOutlierFactor(n_neighbors=k, novelty=True).fit(xtr)
    theirs = -lof.score_samples(xte)  # sklearn returns negative LOF
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_ensemble_average_weighted(rng):
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    xte = rng.normal(size=(10, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0]], bool)
    proba = np.asarray([0.75, 0.25])

    ens = SubspaceEnsemble(subs, proba, base="knn", k=3, normalize=None, chunk=2)
    ens.fit(xtr)
    scores = ens.decision_function(xte)

    s0 = np.asarray(knn_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(subs[0]), 3))
    s1 = np.asarray(knn_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(subs[1]), 3))
    np.testing.assert_allclose(scores, 0.75 * s0 + 0.25 * s1, rtol=1e-5)


def test_ensemble_max_aggregation_with_padding(rng):
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    xte = rng.normal(size=(10, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0], [1, 0, 0, 0, 0, 1]], bool)
    proba = np.asarray([0.5, 0.3, 0.2])

    # chunk=2 forces padding of the mask axis; padded rows must not win
    ens = SubspaceEnsemble(subs, proba, base="knn", k=3, aggregation="max",
                           normalize=None, chunk=2)
    ens.fit(xtr)
    scores = ens.decision_function(xte)
    per = np.stack([
        np.asarray(knn_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(s), 3))
        for s in subs
    ])
    np.testing.assert_allclose(scores, per.max(axis=0), rtol=1e-5)


def test_copod_dim_scores_match_numpy(rng):
    from vgan_tpu.ensemble.od import copod_dim_scores

    xtr = rng.normal(size=(80, 5)).astype(np.float32)
    xte = rng.normal(size=(20, 5)).astype(np.float32)
    ours = np.asarray(copod_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    n = len(xtr)
    left = (xte[:, None, :] >= xtr[None, :, :]).sum(1) / n
    right = (xte[:, None, :] <= xtr[None, :, :]).sum(1) / n
    expected = np.maximum(
        -np.log(np.maximum(left, 1 / n)), -np.log(np.maximum(right, 1 / n))
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_copod_ensemble_weighted_sum(rng):
    from vgan_tpu.ensemble.od import copod_dim_scores

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte = rng.normal(size=(15, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0]], bool)
    proba = np.asarray([0.6, 0.4])

    ens = SubspaceEnsemble(subs, proba, base="copod", normalize=None)
    ens.fit(xtr)
    scores = ens.decision_function(xte)

    dim = np.asarray(copod_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    expected = 0.6 * dim[:, subs[0]].sum(1) + 0.4 * dim[:, subs[1]].sum(1)
    np.testing.assert_allclose(scores, expected, rtol=1e-5)


def test_ensemble_detects_planted_outliers(rng):
    """End-to-end: ensemble scores rank planted outliers above inliers."""
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(50, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32)
    outliers[:, :4] += 6.0
    xte = np.vstack([inliers, outliers])

    subs = (rng.uniform(size=(32, d)) < 0.4)
    subs[~subs.any(axis=1), 0] = True  # no empty masks
    proba = np.full(32, 1 / 32)

    for base in ("knn", "knn_mean", "lof", "copod"):
        ens = SubspaceEnsemble(subs, proba, base=base, k=8).fit(xtr)
        scores = ens.decision_function(xte)
        auc_ok = scores[50:].mean() > scores[:50].mean()
        assert auc_ok, f"{base}: outliers not ranked higher"


def test_from_model(rng):
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(96, 10)).astype(np.float32)
    m = VGAN_no_kl(batch_size=32, epochs=2, verbose=False)
    m.fit(x)
    ens = SubspaceEnsemble.from_model(m, subspace_count=64, base="knn", k=5)
    ens.fit(x)
    scores = ens.decision_function(x[:10])
    assert scores.shape == (10,)
    assert np.all(np.isfinite(scores))
