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


def _planted_outlier_data(rng, n_in=300, n_out=20, d=8):
    xtr = rng.normal(size=(n_in, d)).astype(np.float32)
    inliers = rng.normal(size=(60, d)).astype(np.float32)
    outliers = rng.normal(size=(n_out, d)).astype(np.float32) * 1.5 + 5.0
    xte = np.concatenate([inliers, outliers])
    labels = np.concatenate([np.zeros(60), np.ones(n_out)])
    return xtr, xte, labels


def _auc(scores, labels):
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=float)
    ranks[order] = np.arange(len(scores))
    pos = labels == 1
    return (ranks[pos].mean() - (pos.sum() - 1) / 2) / (~pos).sum()


def test_iforest_detects_planted_outliers(rng):
    from vgan_tpu.ensemble import iforest_scores

    xtr, xte, labels = _planted_outlier_data(rng)
    scores = iforest_scores(xte, xtr, n_trees=100)
    assert scores.shape == (len(xte),)
    assert np.all((scores > 0) & (scores <= 1))
    assert _auc(scores, labels) > 0.95


def test_iforest_agrees_with_sklearn(rng):
    """Statistical agreement with sklearn's IsolationForest (same algorithm,
    independent RNG): both rank the same points as anomalous."""
    sk = pytest.importorskip("sklearn.ensemble")
    from vgan_tpu.ensemble import iforest_scores

    xtr, xte, labels = _planted_outlier_data(rng)
    ours = iforest_scores(xte, xtr, n_trees=200)
    skl = sk.IsolationForest(n_estimators=200, random_state=0).fit(xtr)
    theirs = -skl.score_samples(xte)  # sklearn: lower = more anomalous
    # rank correlation (spearman) between the two scorings
    r_ours = np.argsort(np.argsort(ours)).astype(float)
    r_th = np.argsort(np.argsort(theirs)).astype(float)
    rho = np.corrcoef(r_ours, r_th)[0, 1]
    assert rho > 0.85, rho


def test_iforest_masked_ignores_unselected_features(rng):
    """Outliers only in masked-out dimensions must be invisible."""
    from vgan_tpu.ensemble import iforest_scores_masked

    xtr = rng.normal(size=(200, 6)).astype(np.float32)
    xte = rng.normal(size=(40, 6)).astype(np.float32)
    xte[:10, 4:] += 50.0  # huge outliers, but only in features 4, 5
    mask = np.asarray([1, 1, 1, 1, 0, 0], bool)
    scores = np.asarray(
        iforest_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), n_trees=100
        )
    )
    assert _auc(scores, np.r_[np.ones(10), np.zeros(30)]) < 0.7


def test_ensemble_iforest_base(rng):
    """SubspaceEnsemble with base='iforest' end-to-end (planted outliers)."""
    xtr, xte, labels = _planted_outlier_data(rng)
    d = xtr.shape[1]
    masks = rng.random(size=(6, d)) < 0.6
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(6, 1 / 6, np.float32)
    ens = SubspaceEnsemble(masks, proba, base="iforest", n_trees=64, chunk=2)
    scores = ens.fit(xtr).decision_function(xte)
    assert _auc(scores, labels) > 0.9


def test_pyod_adapter_with_sklearn_lof(rng):
    """The pyod-style CPU adapter path (round-1 advisor gap): sklearn's
    LocalOutlierFactor exposes the same get_params/fit/decision_function
    protocol pyod detectors use."""
    sklearn_neighbors = pytest.importorskip("sklearn.neighbors")

    xtr, xte, labels = _planted_outlier_data(rng)
    d = xtr.shape[1]
    masks = np.asarray([[1, 1, 1, 1, 0, 0, 0, 0], [0, 0, 0, 0, 1, 1, 1, 1]], bool)
    proba = np.asarray([0.5, 0.5], np.float32)
    det = sklearn_neighbors.LocalOutlierFactor(n_neighbors=10, novelty=True)
    ens = SubspaceEnsemble(masks, proba, base=det, normalize=None)
    scores = ens.fit(xtr).decision_function(xte)
    # oracle: manual per-mask loop with fresh detectors
    expected = np.zeros(len(xte))
    for mask, p in zip(masks, proba):
        lof = sklearn_neighbors.LocalOutlierFactor(
            n_neighbors=10, novelty=True
        ).fit(xtr[:, mask])
        expected += p * lof.decision_function(xte[:, mask])
    np.testing.assert_allclose(scores, expected, rtol=1e-6)
    # sklearn decision_function: NEGATIVE = outlier; AUC with flipped sign
    assert _auc(-scores, labels) > 0.9


def test_knn_fused_kernel_matches_generic(rng):
    """C15 fused projection+KNN kernel == the generic vmapped path (same
    scores through aggregation/normalization), incl. duplicate train rows
    (tie-aware exact k-th selection)."""
    xtr = rng.normal(size=(90, 12)).astype(np.float32)
    xtr[40:60] = xtr[:20]  # duplicates -> distance ties
    xte = rng.normal(size=(30, 12)).astype(np.float32)
    masks = rng.random(size=(7, 12)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = rng.random(size=(7,)).astype(np.float32)
    proba /= proba.sum()
    for agg in ("average", "max"):
        for norm in ("zscore", None):
            ens = SubspaceEnsemble(masks, proba, base="knn", k=5,
                                   aggregation=agg, normalize=norm, chunk=2)
            ens.fit(xtr)
            generic = ens.decision_function(xte)  # CPU -> generic path
            fused = ens._knn_fused_decision_function(
                jnp.asarray(xte), force=True
            )
            np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6,
                                       err_msg=f"{agg}/{norm}")


def test_iforest_trees_keep_splitting_past_empty_nodes(rng):
    """Regression (round-2 review): empty-node thresholds were NaN
    (inf + u*(-inf)) and the one-hot matmul lookup poisoned every point at
    the level (0*NaN = NaN on CPU), freezing all splits from the first
    empty node onward."""
    import jax
    import jax.numpy as jnp

    from vgan_tpu.ensemble.iforest import _fit_tree

    x = jnp.asarray(rng.normal(size=(500, 8)).astype(np.float32))
    logits = jnp.zeros((8,))
    _, thrs, sizes, _ = _fit_tree(jax.random.PRNGKey(0), x, logits, 64, 6)
    for level, (t, s) in enumerate(zip(thrs, sizes)):
        assert not np.isnan(np.asarray(t)).any(), f"NaN thresholds, lvl {level}"
    # max node size must strictly shrink across the deeper levels
    max_sizes = [int(np.asarray(s).max()) for s in sizes]
    assert max_sizes[-1] < max_sizes[2], max_sizes


def test_knn_fused_zero_proba_max_and_small_train(rng):
    """Round-2 review: (a) zero-probability masks must not win 'max'
    aggregation on the fused path; (b) k > n_train must not hit the fused
    kernel (pad sentinels are not distances)."""
    from vgan_tpu.ops.pallas.knn_score import knn_kernel_supported

    assert not knn_kernel_supported(10, 8, 4, 10)  # k > ntr
    # very wide d past the resident cap: even the minimum streamed step
    # exceeds VMEM -> the caller must use the generic path, not crash
    assert not knn_kernel_supported(100, 30000, 30000, 10)
    # wide-but-streamable d keeps the fused path (stress regime)
    assert knn_kernel_supported(100, 30000, 10240, 10)

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte = rng.normal(size=(20, 6)).astype(np.float32)
    masks = np.asarray(
        [[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1], [1, 0, 1, 0, 1, 0]], bool
    )
    proba = np.asarray([0.5, 0.0, 0.5], np.float32)  # middle mask: weight 0
    ens = SubspaceEnsemble(masks, proba, base="knn", k=5, aggregation="max",
                           normalize=None, chunk=2)
    ens.fit(xtr)
    generic = ens.decision_function(xte)
    fused = ens._knn_fused_decision_function(jnp.asarray(xte), force=True)
    np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6)


def test_hbos_dim_scores_match_numpy(rng):
    from vgan_tpu.ensemble import hbos_dim_scores

    xtr = rng.normal(size=(80, 5)).astype(np.float32)
    xte = rng.normal(size=(30, 5)).astype(np.float32) * 2.0  # some out-of-range
    n_bins, eps = 10, 1e-12

    ours = np.asarray(
        hbos_dim_scores(jnp.asarray(xte), jnp.asarray(xtr), n_bins=n_bins)
    )

    expected = np.zeros_like(ours)
    for j in range(xtr.shape[1]):
        lo, hi = xtr[:, j].min(), xtr[:, j].max()
        width = max((hi - lo) / n_bins, eps)
        idx_tr = np.clip(((xtr[:, j] - lo) / width).astype(int), 0, n_bins - 1)
        counts = np.bincount(idx_tr, minlength=n_bins).astype(np.float64)
        density = counts / (len(xtr) * width)
        idx_te = np.clip(((xte[:, j] - lo) / width).astype(int), 0, n_bins - 1)
        in_range = (xte[:, j] >= lo) & (xte[:, j] <= hi)
        # out-of-range values get the floor density (maximal score), not an
        # edge bin's density (advisor fix)
        expected[:, j] = -np.log(np.where(in_range, density[idx_te], 0.0) + eps)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_hbos_ensemble_weighted_sum(rng):
    """base='hbos' ensemble == probability-weighted sum of per-mask sums of
    the per-dim scores (the one-matmul identity)."""
    from vgan_tpu.ensemble import hbos_dim_scores

    xtr = rng.normal(size=(50, 6)).astype(np.float32)
    xte = rng.normal(size=(15, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 1]], bool)
    proba = np.asarray([0.6, 0.4], np.float32)

    ens = SubspaceEnsemble(subs, proba, base="hbos", normalize=None)
    ens.fit(xtr)
    scores = ens.decision_function(xte)

    dim = np.asarray(hbos_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    expected = 0.6 * dim[:, subs[0]].sum(1) + 0.4 * dim[:, subs[1]].sum(1)
    np.testing.assert_allclose(scores, expected, rtol=1e-5)


def test_per_subspace_scores_consistent_with_average(rng):
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    xte = rng.normal(size=(12, 6)).astype(np.float32)
    subs = np.asarray(
        [[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0], [1, 0, 0, 0, 0, 1]], bool
    )
    proba = np.asarray([0.5, 0.3, 0.2], np.float32)

    for base in ("knn", "copod", "hbos"):
        ens = SubspaceEnsemble(subs, proba, base=base, k=3, chunk=2)
        ens.fit(xtr)
        s = ens.per_subspace_scores(xte)
        assert s.shape == (3, 12)
        expected = (proba[:, None] * s).sum(0)
        np.testing.assert_allclose(
            ens.decision_function(xte), expected, rtol=1e-4, atol=1e-5
        )


def test_aom_moa_bucketed_aggregation(rng):
    """'aom'/'moa' (combo parity) against a hand-computed bucketing of
    per_subspace_scores (seed-0 shuffle, then round-robin buckets)."""
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    xte = rng.normal(size=(10, 6)).astype(np.float32)
    subs = np.stack([np.roll([1, 1, 1, 0, 0, 0], i) for i in range(4)]).astype(bool)
    proba = np.full((4,), 0.25, np.float32)

    ens = SubspaceEnsemble(subs, proba, base="knn", k=3, chunk=2,
                           aggregation="aom", n_buckets=2)
    ens.fit(xtr)
    s = np.asarray(ens.per_subspace_scores(xte))

    # deterministic seed-0 shuffle (advisor fix: decorrelates adjacent
    # masks), then round-robin buckets over the shuffled order
    sp = s[np.random.default_rng(0).permutation(4)]
    aom = 0.5 * (np.maximum(sp[0], sp[2]) + np.maximum(sp[1], sp[3]))
    np.testing.assert_allclose(ens.decision_function(xte), aom, rtol=1e-5)

    ens.aggregation = "moa"
    moa = np.maximum((sp[0] + sp[2]) / 2, (sp[1] + sp[3]) / 2)
    np.testing.assert_allclose(ens.decision_function(xte), moa, rtol=1e-5)


def test_predict_contamination_threshold(rng):
    """predict: one-batch scoring (shared zscore stats), self-pairs excluded
    on the train rows, threshold at the (1-contamination) train quantile."""
    xtr = rng.normal(size=(100, 5)).astype(np.float32)
    xte = np.concatenate(
        [rng.normal(size=(20, 5)), rng.normal(size=(5, 5)) + 6.0]
    ).astype(np.float32)
    subs = np.ones((1, 5), bool)
    for normalize in (None, "zscore"):
        ens = SubspaceEnsemble(subs, np.ones(1), base="knn", k=5,
                               contamination=0.1, normalize=normalize)
        ens.fit(xtr)
        labels = ens.predict(xte)
        # oracle: same one-batch scoring
        both = ens.decision_function(
            np.concatenate([xtr, xte]), exclude_self=True
        )
        assert ens.threshold_ == pytest.approx(
            float(np.quantile(both[:100], 0.9))
        )
        np.testing.assert_array_equal(
            labels, (both[100:] > ens.threshold_).astype(np.int64)
        )
        assert labels.shape == (25,)
        assert labels[20:].all()  # planted outliers flagged
        assert labels[:20].sum() <= 4  # inliers mostly clean


def test_knn_exclude_self_matches_numpy(rng):
    """exclude_self: the k-th NN of a train row against the train set must
    skip the zero self-distance (== the (k+1)-th including self)."""
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    mask = np.ones(6, bool)
    k = 4
    ours = np.asarray(knn_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), jnp.asarray(mask), k,
        exclude_self=True,
    ))
    d = np.sqrt(((xtr[:, None] - xtr[None, :]) ** 2).sum(-1))
    expected = np.sort(d, axis=1)[:, k]  # (k+1)-th incl. the self zero
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_aom_ignores_zero_probability_masks(rng):
    """Zero-probability masks must not influence 'aom'/'moa' (the invariant
    every aggregation path honors)."""
    xtr = rng.normal(size=(30, 6)).astype(np.float32)
    xte = rng.normal(size=(8, 6)).astype(np.float32)
    subs = np.asarray(
        [[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 0, 0], [0, 0, 0, 0, 1, 1]], bool
    )
    with_dead = SubspaceEnsemble(
        subs, np.asarray([0.5, 0.5, 0.0]), base="knn", k=3,
        aggregation="aom", n_buckets=2, normalize=None,
    ).fit(xtr)
    without = SubspaceEnsemble(
        subs[:2], np.asarray([0.5, 0.5]), base="knn", k=3,
        aggregation="aom", n_buckets=2, normalize=None,
    ).fit(xtr)
    np.testing.assert_allclose(
        with_dead.decision_function(xte), without.decision_function(xte),
        rtol=1e-6,
    )


def test_export_rejects_bucketed_aggregation(rng, tmp_path):
    from vgan_tpu.serving import export_ensemble_scorer

    xtr = rng.normal(size=(20, 4)).astype(np.float32)
    subs = np.ones((2, 4), bool)
    ens = SubspaceEnsemble(subs, np.full(2, 0.5), base="knn", k=3,
                           aggregation="aom").fit(xtr)
    with pytest.raises(ValueError, match="aom"):
        export_ensemble_scorer(ens, tmp_path / "scorer.bin")


def test_knn_fused_per_subspace_matches_generic(rng):
    """The fused (n_masks, nt) fast path for per_subspace_scores (used by
    'aom'/'moa' on TPU) matches the generic chunked path."""
    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte = rng.normal(size=(20, 6)).astype(np.float32)
    masks = np.asarray(
        [[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1], [1, 0, 1, 0, 1, 0]], bool
    )
    ens = SubspaceEnsemble(masks, np.full(3, 1 / 3), base="knn", k=5,
                           normalize=None, chunk=2).fit(xtr)
    generic = ens.per_subspace_scores(xte)
    fused = ens._knn_fused_per_subspace(jnp.asarray(xte), force=True)
    np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6)


def test_dim_path_max_aggregation(rng):
    """'max' aggregation on the one-matmul (copod/hbos) path matches the
    per-mask maximum of raw masked sums."""
    from vgan_tpu.ensemble import copod_dim_scores

    xtr = rng.normal(size=(50, 6)).astype(np.float32)
    xte = rng.normal(size=(12, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]], bool)
    proba = np.asarray([0.5, 0.5], np.float32)

    ens = SubspaceEnsemble(subs, proba, base="copod", aggregation="max",
                           normalize=None).fit(xtr)
    scores = ens.decision_function(xte)
    dim = np.asarray(copod_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    expected = np.maximum(dim[:, subs[0]].sum(1), dim[:, subs[1]].sum(1))
    np.testing.assert_allclose(scores, expected, rtol=1e-5)


def test_knn_fused_mean_mode_matches_generic(rng):
    """mode='mean' in the fused kernel == vmapped mean_dist_scores_masked
    (pyod KNN 'mean'), including through the SubspaceEnsemble fast path."""
    from vgan_tpu.ops.pallas.knn_score import knn_scores_all_masks

    xtr = rng.normal(size=(70, 6)).astype(np.float32)
    xte = rng.normal(size=(20, 6)).astype(np.float32)
    masks = np.asarray(
        [[1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1], [1, 0, 1, 0, 1, 0]], bool
    )
    k = 5
    fused = np.asarray(knn_scores_all_masks(
        jnp.asarray(xte), jnp.asarray(xtr), masks, k, interpret=True,
        mode="mean",
    ))
    expected = np.stack([
        np.asarray(mean_dist_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(m), k))
        for m in masks
    ])
    np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6)

    ens = SubspaceEnsemble(masks, np.full(3, 1 / 3), base="knn_mean", k=k,
                           normalize=None, chunk=2).fit(xtr)
    generic = ens.decision_function(xte)
    fast = ens._knn_fused_decision_function(jnp.asarray(xte), force=True)
    np.testing.assert_allclose(fast, generic, rtol=1e-5, atol=1e-6)


def test_knn_fused_mean_mode_with_duplicates(rng):
    """Tie groups must contribute the right multiplicity to the k-NN mean."""
    from vgan_tpu.ops.pallas.knn_score import knn_scores_all_masks

    xtr = np.repeat(rng.normal(size=(10, 4)), 3, axis=0).astype(np.float32)
    xte = rng.normal(size=(8, 4)).astype(np.float32)
    mask = np.ones((1, 4), bool)
    k = 4  # crosses tie-group boundaries (groups of 3 duplicates)
    fused = np.asarray(knn_scores_all_masks(
        jnp.asarray(xte), jnp.asarray(xtr), mask, k, interpret=True,
        mode="mean",
    ))[0]
    d = np.sqrt(((xte[:, None] - xtr[None, :]) ** 2).sum(-1))
    expected = np.sort(d, axis=1)[:, :k].mean(1)
    np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6)


def test_knn_fused_exclude_self_matches_generic(rng):
    """Round 3: exclude_self rides the fused kernel (in-kernel positional
    diagonal drop) and matches the generic path — the predict() scoring
    pattern where the leading test rows ARE the train rows."""
    xtr = rng.normal(size=(50, 8)).astype(np.float32)
    xte = rng.normal(size=(20, 8)).astype(np.float32)
    both = np.concatenate([xtr, xte])
    masks = rng.uniform(size=(12, 8)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(12, 1 / 12)

    for base in ("knn", "knn_mean"):
        for agg in ("average", "max"):
            ens = SubspaceEnsemble(masks, proba, base=base, k=5,
                                   aggregation=agg, normalize=None, chunk=4)
            ens.fit(xtr)
            generic = np.asarray(
                ens._native_scores(jnp.asarray(both), True, reduce=True)
            )
            fused = ens._knn_fused_decision_function(
                jnp.asarray(both), force=True, exclude_self=True
            )
            np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6,
                                       err_msg=f"{base}/{agg}")


def test_knn_fused_per_subspace_exclude_self(rng):
    """per_subspace_scores(exclude_self=True) fused == generic."""
    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    masks = rng.uniform(size=(8, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    ens = SubspaceEnsemble(masks, np.full(8, 1 / 8), base="knn", k=4,
                           normalize=None, chunk=4).fit(xtr)
    generic = np.asarray(
        ens._native_scores(jnp.asarray(xtr), True, reduce=False)
    ).reshape(-1, xtr.shape[0])[:8]
    fused = ens._knn_fused_per_subspace(
        jnp.asarray(xtr), force=True, exclude_self=True
    )
    np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6)


def test_knn_fused_mesh_matches_single_device(rng):
    """The fused kernel composed with mesh= (mask-sharded shard_map +
    psum/pmax) matches the single-device fused path, including a mask
    count that does not divide the device count (zero-proba padding)."""
    import jax
    from jax.sharding import Mesh

    xtr = rng.normal(size=(40, 8)).astype(np.float32)
    xte = rng.normal(size=(24, 8)).astype(np.float32)
    both = np.concatenate([xtr, xte])
    masks = rng.uniform(size=(13, 8)) < 0.5  # 13 % 8 != 0 -> padded shards
    masks[~masks.any(axis=1), 0] = True
    proba = rng.uniform(size=13) + 0.1
    proba = proba / proba.sum()
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

    for agg in ("average", "max"):
        for excl, x_in in ((False, xte), (True, both)):
            single = SubspaceEnsemble(masks, proba, base="knn", k=5,
                                      aggregation=agg, normalize=None)
            single.fit(xtr)
            ref = single._knn_fused_decision_function(
                jnp.asarray(x_in), force=True, exclude_self=excl
            )
            sharded = SubspaceEnsemble(masks, proba, base="knn", k=5,
                                       aggregation=agg, normalize=None,
                                       mesh=mesh)
            sharded.fit(xtr)
            out = sharded._knn_fused_decision_function(
                jnp.asarray(x_in), force=True, exclude_self=excl
            )
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6,
                                       err_msg=f"{agg}/excl={excl}")


def test_streaming_knn_matches_dense(rng, monkeypatch):
    """Round 3: past STREAM_NTR the neighbor scorers stream the train axis
    in blocks (running exact k-smallest merge; no (nt, ntr) matrix) —
    identical scores to the dense path, including exclude_self and LOF's
    neighbor-index-dependent chain."""
    import vgan_tpu.ensemble.od as od

    monkeypatch.setattr(od, "STREAM_NTR", 40)
    monkeypatch.setattr(od, "_STREAM_BLOCK", 32)  # forces 3 ragged blocks

    xtr = rng.normal(size=(90, 7)).astype(np.float32)
    xte = rng.normal(size=(25, 7)).astype(np.float32)
    mask = jnp.asarray(
        np.array([1, 0, 1, 1, 0, 1, 0], bool).astype(np.float32)
    )
    for fn in (od.knn_scores_masked, od.mean_dist_scores_masked,
               od.lof_scores_masked):
        for excl, xq in ((False, xte), (True, xtr)):
            stream = fn(jnp.asarray(xq), jnp.asarray(xtr), mask, 5,
                        exclude_self=excl)
            monkeypatch.setattr(od, "STREAM_NTR", 10**9)  # dense route
            dense = fn(jnp.asarray(xq), jnp.asarray(xtr), mask, 5,
                       exclude_self=excl)
            monkeypatch.setattr(od, "STREAM_NTR", 40)
            np.testing.assert_allclose(
                np.asarray(stream), np.asarray(dense), rtol=1e-5, atol=1e-6,
                err_msg=f"{fn.__name__}/excl={excl}",
            )


def test_streaming_knn_through_ensemble(rng, monkeypatch):
    """SubspaceEnsemble end-to-end over the streaming route (chunked vmap
    over masks composes with the train-axis scan), against a NUMPY oracle.

    The expected scores are computed host-side (not via the dense jitted
    path: with identical static args and shapes a dense-then-patch
    comparison would hit the jit cache and never retrace with streaming
    engaged), and chunk=3 differs from any earlier test's mask-chunk
    shapes so this trace happens AFTER the monkeypatch below.
    """
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(70, 6)).astype(np.float32)
    xte = rng.normal(size=(20, 6)).astype(np.float32)
    masks = rng.uniform(size=(9, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(9, 1 / 9)

    monkeypatch.setattr(od, "STREAM_NTR", 48)
    monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
    ens = SubspaceEnsemble(masks, proba, base="knn", k=4, chunk=3,
                           normalize=None).fit(xtr)
    stream = ens.decision_function(xte)

    per = np.stack([
        np.sort(
            np.sqrt(((xte[:, None, m] - xtr[None, :, m]) ** 2).sum(-1)),
            axis=1,
        )[:, 3]
        for m in masks
    ])
    expected = (proba[:, None] * per).sum(axis=0)
    np.testing.assert_allclose(stream, expected, rtol=1e-4, atol=1e-6)


def test_streaming_memory_governors(rng, monkeypatch):
    """The streaming route's chunk clamp (masks in flight) and adaptive
    train-block never change scores — only the tiling."""
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(80, 6)).astype(np.float32)
    xte = rng.normal(size=(30, 6)).astype(np.float32)
    masks = rng.uniform(size=(10, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(10, 0.1)

    for base in ("knn", "lof"):
        ens = SubspaceEnsemble(masks, proba, base=base, k=3, chunk=8,
                               normalize=None).fit(xtr)
        ref = ens.decision_function(xte)
        monkeypatch.setattr(od, "STREAM_NTR", 40)
        monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
        # force the tightest governors: 1 mask in flight, minimum block
        monkeypatch.setattr(od, "_STREAM_CHUNK_BUDGET", 1)
        monkeypatch.setattr(od, "_STREAM_TILE_BUDGET", 1)
        got = ens.decision_function(xte)
        monkeypatch.undo()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=base)
    # the governor helpers themselves
    assert od._stream_block(1024) == od._STREAM_BLOCK
    assert od._stream_block(10**6) == 512  # floor
    assert od._stream_chunk(128, 1024, 8192) == 16
    assert od._stream_chunk(128, 64, 512) == 128  # small stays unclamped

def test_knn_stream_kernel_matches_generic(rng, monkeypatch):
    """The streaming Pallas kernel (train axis as a third grid dim with a
    running k-smallest multiset scratch) is exact vs the generic path —
    forced by shrinking the resident VMEM cap so nb > 1 blocks stream."""
    import vgan_tpu.ops.pallas.knn_score as ks

    xtr = rng.normal(size=(300, 6)).astype(np.float32)
    # duplicate rows so tie groups cross block boundaries
    xtr[150:180] = xtr[:30]
    xte = rng.normal(size=(40, 6)).astype(np.float32)
    masks = rng.uniform(size=(5, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    k = 5

    monkeypatch.setattr(ks, "MAX_NTR_D", 128 * 128 * 2)  # TRB=256, nb=2
    assert not ks._resident_supported(xtr.shape[0], 128)
    for mode, oracle in (
        ("kth", knn_scores_masked),
        ("mean", mean_dist_scores_masked),
    ):
        fused = np.asarray(ks.knn_scores_all_masks(
            jnp.asarray(xte), jnp.asarray(xtr), masks, k, interpret=True,
            mode=mode,
        ))
        expected = np.stack([
            np.asarray(oracle(jnp.asarray(xte), jnp.asarray(xtr),
                              jnp.asarray(m), k))
            for m in masks
        ])
        np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6,
                                   err_msg=mode)


def test_knn_stream_kernel_exclude_self(rng, monkeypatch):
    """Streaming kernel with the in-kernel positional diagonal drop: the
    predict() pattern (leading test rows ARE the train rows) at nb > 1."""
    import vgan_tpu.ensemble.od as od
    import vgan_tpu.ops.pallas.knn_score as ks

    xtr = rng.normal(size=(280, 5)).astype(np.float32)
    xte = rng.normal(size=(30, 5)).astype(np.float32)
    both = np.concatenate([xtr, xte])
    masks = rng.uniform(size=(6, 5)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6)

    monkeypatch.setattr(ks, "MAX_NTR_D", 128 * 128 * 2)
    ens = SubspaceEnsemble(masks, proba, base="knn", k=4,
                           normalize=None, chunk=3).fit(xtr)
    generic = np.asarray(
        ens._native_scores(jnp.asarray(both), True, reduce=True)
    )
    fused = ens._knn_fused_decision_function(
        jnp.asarray(both), force=True, exclude_self=True
    )
    np.testing.assert_allclose(fused, generic, rtol=1e-5, atol=1e-6)


def test_ecod_dim_scores_match_numpy(rng):
    """ECOD per-dim planes vs a direct numpy oracle: left/right neg-log
    ECDF tails (floored at 1/n) + skew-selected auto plane."""
    from vgan_tpu.ensemble import ecod_dim_scores

    xtr = rng.normal(size=(80, 5)).astype(np.float32)
    xtr[:, 2] = rng.exponential(size=80)  # right-skewed column
    xtr[:, 3] = -rng.exponential(size=80)  # left-skewed column
    xte = rng.normal(size=(20, 5)).astype(np.float32)
    ours = np.asarray(ecod_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    n = len(xtr)
    left = (xte[:, None, :] >= xtr[None, :, :]).sum(1) / n
    right = (xte[:, None, :] <= xtr[None, :, :]).sum(1) / n
    u_l = -np.log(np.maximum(left, 1 / n))
    u_r = -np.log(np.maximum(right, 1 / n))
    skew = ((xtr - xtr.mean(0)) ** 3).mean(0)
    u_auto = np.where(skew < 0, u_l, u_r)
    np.testing.assert_allclose(ours[..., 0], u_l, rtol=1e-5)
    np.testing.assert_allclose(ours[..., 1], u_r, rtol=1e-5)
    np.testing.assert_allclose(ours[..., 2], u_auto, rtol=1e-5)


def test_ecod_ensemble_max_of_sums(rng):
    """base='ecod' ensemble == probability-weighted sum over masks of the
    paper's max-of-plane-sums score restricted to each mask's dims."""
    from vgan_tpu.ensemble import ecod_dim_scores

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte = rng.normal(size=(15, 6)).astype(np.float32)
    subs = np.asarray([[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0]], bool)
    proba = np.asarray([0.6, 0.4], np.float32)

    ens = SubspaceEnsemble(subs, proba, base="ecod", normalize=None)
    ens.fit(xtr)
    scores = ens.decision_function(xte)

    dim = np.asarray(ecod_dim_scores(jnp.asarray(xte), jnp.asarray(xtr)))
    per_mask = np.stack([
        dim[:, m, :].sum(axis=1).max(axis=-1) for m in subs
    ])  # (n_masks, nt): max over the 3 plane sums, per mask
    expected = (proba[:, None] * per_mask).sum(0)
    np.testing.assert_allclose(scores, expected, rtol=1e-5)

    # per_subspace_scores agrees with the same oracle
    ps = ens.per_subspace_scores(xte)
    np.testing.assert_allclose(ps, per_mask, rtol=1e-5)


def test_ecod_detects_planted_outliers_and_aggregations(rng):
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(50, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32)
    outliers[:, :4] += 6.0
    xte = np.vstack([inliers, outliers])
    subs = rng.uniform(size=(32, d)) < 0.4
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(32, 1 / 32)

    for agg in ("average", "max", "aom", "moa"):
        ens = SubspaceEnsemble(subs, proba, base="ecod",
                               aggregation=agg).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores.shape == (60,)
        assert scores[50:].mean() > scores[:50].mean(), agg
    labels = SubspaceEnsemble(subs, proba, base="ecod").fit(xtr).predict(xte)
    assert labels[50:].mean() > labels[:50].mean()


def test_heterogeneous_ensemble_combination(rng):
    """HeterogeneousEnsemble == standardized member decision_functions
    combined by mean/max; members ride their own SubspaceEnsemble paths."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble, SubspaceEnsemble

    d = 10
    xtr = rng.normal(size=(120, d)).astype(np.float32)
    xte = rng.normal(size=(40, d)).astype(np.float32)
    subs = rng.uniform(size=(8, d)) < 0.4
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)
    members = [{"base": "knn", "k": 5}, {"base": "ecod"}, {"base": "hbos"}]

    expected_rows = []
    for m in members:
        s = SubspaceEnsemble(subs, proba, **m).fit(xtr).decision_function(xte)
        s = np.asarray(s, np.float64)
        expected_rows.append((s - s.mean()) / (s.std() + 1e-12))
    expected = np.stack(expected_rows)

    for comb, red in (("average", np.mean), ("max", np.max)):
        het = HeterogeneousEnsemble(
            subs, proba, members=members, combination=comb
        ).fit(xtr)
        got = het.decision_function(xte)
        np.testing.assert_allclose(got, red(expected, axis=0), rtol=1e-4,
                                   atol=1e-5)


def test_heterogeneous_ensemble_predict_and_outliers(rng):
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    d = 12
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(40, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32)
    outliers[:, :4] += 6.0
    xte = np.vstack([inliers, outliers])
    subs = rng.uniform(size=(16, d)) < 0.4
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(16, 1 / 16, np.float32)

    het = HeterogeneousEnsemble(
        subs, proba,
        members=[{"base": "knn", "k": 8}, {"base": "lof", "k": 8},
                 {"base": "ecod"}],
    ).fit(xtr)
    scores = het.decision_function(xte)
    assert scores[40:].mean() > scores[:40].mean()
    labels = het.predict(xte)
    assert labels.shape == (50,)
    assert het.threshold_ is not None
    assert labels[40:].mean() > labels[:40].mean()

    import pytest
    with pytest.raises(ValueError):
        HeterogeneousEnsemble(subs, proba, combination="trimmed_mean")
    with pytest.raises(ValueError):
        HeterogeneousEnsemble(subs, proba, members=[])


def test_mahalanobis_scores_match_numpy(rng):
    """mahalanobis_scores_masked == the submatrix Mahalanobis quadratic form
    (same ddof=1 covariance and scale-aware ridge), and unmasked features
    are exactly inert."""
    from vgan_tpu.ensemble import mahalanobis_scores_masked

    xtr = rng.normal(size=(80, 9)).astype(np.float32)
    xte = rng.normal(size=(30, 9)).astype(np.float32)
    mask = np.zeros(9, bool)
    mask[[0, 2, 5, 6]] = True

    ours = np.asarray(
        mahalanobis_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)
        )
    )

    sub = np.flatnonzero(mask)
    mu = xtr[:, sub].mean(axis=0)
    xc = xtr[:, sub] - mu
    cov = (xc.T @ xc) / (len(xtr) - 1)
    cov = cov + np.eye(len(sub)) * (1e-6 * np.trace(cov) / len(sub))
    z = xte[:, sub] - mu
    expected = np.einsum("ij,ij->i", z, np.linalg.solve(cov, z.T).T)
    np.testing.assert_allclose(ours, expected, rtol=2e-4)

    # garbage in unmasked features cannot move the scores
    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 100.0
    ours_noisy = np.asarray(
        mahalanobis_scores_masked(
            jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(ours_noisy, ours, rtol=1e-5)


def test_mahalanobis_rank_deficient_subspace_is_finite(rng):
    """d_sub > n_train - 1: the ridge keeps the solve well-posed (scores
    finite, outliers still ranked above inliers along the data directions).
    """
    from vgan_tpu.ensemble import mahalanobis_scores_masked

    d = 20
    xtr = rng.normal(size=(8, d)).astype(np.float32)  # rank 7 < d_sub=20
    xte = rng.normal(size=(10, d)).astype(np.float32)
    mask = np.ones(d, bool)
    s = np.asarray(
        mahalanobis_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)
        )
    )
    assert np.all(np.isfinite(s)) and np.all(s >= 0)


def test_ensemble_mahalanobis_base(rng):
    """End-to-end SubspaceEnsemble(base='mahalanobis'): correlated train
    data, outliers planted OFF the correlation structure (unit marginal
    scale — invisible to axis-aligned distance bases, loud in Mahalanobis),
    aggregation paths and predict()."""
    d = 10
    z = rng.normal(size=(300, 1)).astype(np.float32)
    xtr = np.repeat(z, d, axis=1) + 0.1 * rng.normal(size=(300, d)).astype(
        np.float32
    )
    inl_z = rng.normal(size=(30, 1)).astype(np.float32)
    inliers = np.repeat(inl_z, d, axis=1) + 0.1 * rng.normal(
        size=(30, d)
    ).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32)  # decorrelated
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(12, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    subs[:, :2] = True  # every mask keeps >= 2 coupled dims
    proba = np.full(12, 1 / 12, np.float32)

    for agg in ("average", "max", "aom"):
        ens = SubspaceEnsemble(
            subs, proba, base="mahalanobis", aggregation=agg, chunk=5
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), agg

    ens = SubspaceEnsemble(subs, proba, base="mahalanobis").fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert ens.threshold_ is not None
    assert labels[30:].mean() > labels[:30].mean()

    # per-subspace matrix consistent with the weighted-average aggregation
    ens_raw = SubspaceEnsemble(
        subs, proba, base="mahalanobis", normalize=None
    ).fit(xtr)
    s = ens_raw.per_subspace_scores(xte)
    np.testing.assert_allclose(
        (proba[:, None] * s).sum(axis=0),
        ens_raw.decision_function(xte),
        rtol=1e-4,
    )


class _NoiseDetector:
    """pyod-style detector returning seeded noise — a deliberately broken
    ensemble member for the 'select' reliability-weighting test."""

    def __init__(self, seed=0):
        self.seed = seed

    def get_params(self):
        return {"seed": self.seed}

    def fit(self, x):
        return self

    def decision_function(self, x):
        return np.random.default_rng(self.seed).normal(size=len(x))


def test_heterogeneous_select_downweights_noise_member(rng):
    """combination='select': a pure-noise member gets a smaller consensus-
    correlation weight than the real detectors, and the combined scores
    still rank planted outliers on top."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    d = 10
    xtr = rng.normal(size=(120, d)).astype(np.float32)
    inliers = rng.normal(size=(40, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])
    subs = rng.uniform(size=(8, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)

    het = HeterogeneousEnsemble(
        subs, proba, combination="select",
        members=[{"base": "knn", "k": 8}, {"base": "ecod"},
                 {"base": _NoiseDetector()}],
    ).fit(xtr)
    assert het.member_weights_ is None  # not scored yet
    scores = het.decision_function(xte)
    w = het.member_weights_
    assert w is not None and w.shape == (3,)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    assert w[2] < w[0] and w[2] < w[1]  # noise member downweighted
    assert scores[40:].mean() > scores[:40].mean()

    # degenerate fall-back: all correlations clip to zero -> uniform
    from vgan_tpu.ensemble.hetero import _combine

    _, w_uniform = _combine(
        np.stack([np.array([1.0, -1.0]), np.array([-1.0, 1.0])]), "select"
    )
    np.testing.assert_allclose(w_uniform, [0.5, 0.5])


def test_loda_scores_match_numpy(rng):
    """loda_scores_masked vs a direct numpy transcription of the LODA
    recipe (masked dense projections -> equal-width train histograms ->
    mean -log density), on the SAME projection matrix."""
    import jax

    from vgan_tpu.ensemble import loda_scores_masked

    d, n_tr, nt, P, B = 7, 60, 25, 16, 10
    xtr = rng.normal(size=(n_tr, d)).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(nt - 5, d)),
        rng.normal(size=(5, d)) + 4.0,  # includes out-of-range points
    ]).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0], bool)

    ours = np.asarray(loda_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_projections=P, n_bins=B, seed=3,
    ))

    w = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (d, P), jnp.float32),
        np.float64,
    ) * mask.astype(np.float64)[:, None]
    z_tr = xtr.astype(np.float64) @ w
    z_te = xte.astype(np.float64) @ w
    eps = 1e-12
    want = np.zeros(nt)
    for p in range(P):
        lo, hi = z_tr[:, p].min(), z_tr[:, p].max()
        width = max((hi - lo) / B, eps)
        idx_tr = np.clip(((z_tr[:, p] - lo) / width).astype(int), 0, B - 1)
        counts = np.bincount(idx_tr, minlength=B).astype(np.float64)
        density = counts / (n_tr * width)
        idx_te = np.clip(((z_te[:, p] - lo) / width).astype(int), 0, B - 1)
        dens_te = density[idx_te]
        dens_te[(z_te[:, p] < lo) | (z_te[:, p] > hi)] = 0.0
        want += -np.log(dens_te + eps)
    want /= P
    np.testing.assert_allclose(ours, want, rtol=2e-4)


def test_loda_deterministic_per_seed(rng):
    from vgan_tpu.ensemble import loda_scores_masked

    xtr = jnp.asarray(rng.normal(size=(50, 6)).astype(np.float32))
    xte = jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32))
    mask = jnp.asarray(np.ones(6, bool))
    a = np.asarray(loda_scores_masked(xte, xtr, mask, seed=0))
    b = np.asarray(loda_scores_masked(xte, xtr, mask, seed=0))
    c = np.asarray(loda_scores_masked(xte, xtr, mask, seed=1))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_inne_scores_match_numpy(rng):
    """inne_scores_masked vs a direct f64 numpy transcription of the
    pyod INNE recipe (squared-distance convention: sklearn
    euclidean_distances(..., squared=True) end to end) on the SAME
    host-drawn center subsample."""
    from vgan_tpu.ensemble import inne_scores_masked

    d, n_tr, nt, T, P = 7, 60, 25, 12, 5
    xtr = rng.normal(size=(n_tr, d)).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(nt - 5, d)),
        rng.normal(size=(5, d)) + 6.0,  # includes uncovered points
    ]).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0], bool)

    ours = np.asarray(inne_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_estimators=T, psi=P, seed=3,
    ))

    host = np.random.default_rng(3)
    idx = np.stack(
        [host.choice(n_tr, size=P, replace=False) for _ in range(T)]
    )
    xm_tr = xtr.astype(np.float64) * mask
    xm_te = xte.astype(np.float64) * mask
    want = np.ones((nt, T))
    for t in range(T):
        c = xm_tr[idx[t]]  # (P, d)
        d2 = ((c[:, None] - c[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        r2 = d2.min(axis=1)
        ratio = 1.0 - r2[d2.argmin(axis=1)] / r2
        dq = ((xm_te[:, None] - c[None]) ** 2).sum(-1)  # (nt, P)
        for i in range(nt):
            cov = dq[i] <= r2
            if cov.any():
                j = np.where(cov, r2, np.inf).argmin()
                want[i, t] = ratio[j]
    np.testing.assert_allclose(ours, want.mean(axis=1), rtol=1e-4, atol=1e-5)


def test_inne_deterministic_per_seed(rng):
    from vgan_tpu.ensemble import inne_scores_masked

    xtr = jnp.asarray(rng.normal(size=(50, 6)).astype(np.float32))
    xte = jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32))
    mask = jnp.asarray(np.ones(6, bool))
    a = np.asarray(inne_scores_masked(xte, xtr, mask, seed=0))
    b = np.asarray(inne_scores_masked(xte, xtr, mask, seed=0))
    c = np.asarray(inne_scores_masked(xte, xtr, mask, seed=1))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_inne_psi_clamps_and_guards(rng):
    from vgan_tpu.ensemble import inne_scores_masked

    xte = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    mask = jnp.asarray(np.ones(4, bool))
    # psi > n_train clamps to n_train (pyod's 'auto' = min(psi, n))
    small = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    s = np.asarray(inne_scores_masked(
        xte, small, mask, n_estimators=4, psi=8, seed=0
    ))
    assert s.shape == (5,) and np.all(np.isfinite(s))
    # < 2 train rows cannot define a ball radius
    with pytest.raises(ValueError, match="at least 2 train rows"):
        inne_scores_masked(xte, small[:1], mask, n_estimators=4, psi=8)
    with pytest.raises(ValueError, match="inne_psi"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="inne", inne_psi=1,
        )


def test_ensemble_inne_base(rng):
    """End-to-end SubspaceEnsemble(base='inne'): planted mean-shift
    outliers (uncovered by every ball -> score 1) rank above inliers
    through the aggregations; predict() works; scores live in [<=1]."""
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 6.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(10, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(10, 1 / 10, np.float32)

    for agg in ("average", "max", "moa"):
        ens = SubspaceEnsemble(
            subs, proba, base="inne", aggregation=agg, chunk=4,
            n_trees=32,
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), agg

    ens = SubspaceEnsemble(subs, proba, base="inne", n_trees=32).fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()

    ens_raw = SubspaceEnsemble(
        subs, proba, base="inne", normalize=None, n_trees=32
    ).fit(xtr)
    s = ens_raw.per_subspace_scores(xte)
    assert np.all(s <= 1.0 + 1e-6)
    np.testing.assert_allclose(
        (proba[:, None] * s).sum(axis=0),
        ens_raw.decision_function(xte),
        rtol=1e-4,
    )


def test_pca_scores_match_numpy(rng):
    """pca_scores_masked vs a direct f64 numpy transcription of pyod's
    PCA recipe (standardize -> fit PCA with svd_flip signs -> sum of
    query-to-component-vector Euclidean distances weighted by inverse
    explained-variance ratio, n_selected taken from the SMALLEST-variance
    end), across every knob combination."""
    from vgan_tpu.ensemble import pca_scores_masked

    d, n_tr, nt = 7, 40, 12
    xtr = rng.normal(size=(n_tr, d)).astype(np.float32)
    xte = rng.normal(size=(nt, d)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 1, 0, 1], bool)

    def oracle(n_components=0, n_selected=0, standardize=True,
               weighted=True):
        xm = xtr.astype(np.float64) * mask
        zm = xte.astype(np.float64) * mask
        if standardize:
            mu = xm.mean(0)
            sd = np.sqrt(((xm - mu) ** 2).mean(0))
            sd[sd == 0] = 1.0
        else:
            mu, sd = np.zeros(d), np.ones(d)
        ztr, zte = (xm - mu) / sd, (zm - mu) / sd
        c = ztr - ztr.mean(0)
        evals, evecs = np.linalg.eigh(c.T @ c / (n_tr - 1))
        evals = np.maximum(evals[::-1], 0)
        v = evecs[:, ::-1]
        # svd_flip u_based_decision=False (sklearn >= 1.5 PCA)
        i = np.abs(v).argmax(0)
        s = np.sign(v[i, np.arange(d)])
        s[s == 0] = 1
        v = v * s
        valid = evals > max(evals[0] * 1e-5, np.finfo(np.float64).tiny)
        r = int(valid.sum())
        ncomp = min(n_components, r) if n_components > 0 else r
        nsel = min(n_selected, ncomp) if n_selected > 0 else ncomp
        vv = v[:, valid][:, :ncomp][:, ncomp - nsel:ncomp]
        ev = evals[valid][:ncomp][ncomp - nsel:ncomp]
        # queries stay UNcentered by PCA's own mean, as pyod's do
        dist = np.linalg.norm(
            zte[:, None, :] - vv.T[None, :, :], axis=2
        )
        w = evals.sum() / ev if weighted else np.ones_like(ev)
        return dist @ w

    for kw in (dict(), dict(n_selected=3),
               dict(n_components=4, n_selected=2),
               dict(standardize=False), dict(weighted=False)):
        ours = np.asarray(pca_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), **kw
        ))
        np.testing.assert_allclose(ours, oracle(**kw), rtol=2e-4)


def test_pca_guards(rng):
    from vgan_tpu.ensemble import pca_scores_masked

    xte = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    mask = jnp.asarray(np.ones(4, bool))
    one = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="at least 2 train rows"):
        pca_scores_masked(xte, one, mask)
    with pytest.raises(ValueError, match="pca_n_selected"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="pca", pca_n_selected=-1,
        )
    with pytest.raises(ValueError, match="pca_n_components"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="pca", pca_n_components=1.5,
        )


def test_ensemble_pca_base(rng):
    """End-to-end SubspaceEnsemble(base='pca'): planted variance/mean
    outliers rank above inliers through the aggregations; predict()
    works; n_selected flows through the ensemble."""
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(10, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(10, 1 / 10, np.float32)

    for agg in ("average", "max", "moa"):
        ens = SubspaceEnsemble(
            subs, proba, base="pca", aggregation=agg, chunk=4,
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), agg

    ens = SubspaceEnsemble(subs, proba, base="pca").fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()

    sel = SubspaceEnsemble(
        subs, proba, base="pca", pca_n_selected=2,
    ).fit(xtr)
    s_sel = sel.decision_function(xte)
    assert s_sel.shape == (40,) and np.all(np.isfinite(s_sel))
    assert not np.allclose(s_sel, ens.decision_function(xte))


def test_sampling_scores_match_numpy(rng):
    """sampling_scores_masked vs a direct f64 numpy transcription of the
    pyod Sampling recipe (min Euclidean distance to the SAME host-drawn
    train subsample)."""
    from vgan_tpu.ensemble import sampling_scores_masked

    d, n_tr, nt, s = 7, 50, 15, 12
    xtr = rng.normal(size=(n_tr, d)).astype(np.float32)
    xte = rng.normal(size=(nt, d)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0], bool)

    ours = np.asarray(sampling_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        subset_size=s, seed=5,
    ))
    idx = np.random.default_rng(5).choice(n_tr, size=s, replace=False)
    sub = xtr.astype(np.float64)[idx] * mask
    want = np.sqrt(
        (((xte.astype(np.float64) * mask)[:, None] - sub[None]) ** 2)
        .sum(-1).min(axis=1)
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)

    # determinism per seed; different seed -> different subsample
    a = np.asarray(sampling_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), seed=0))
    b = np.asarray(sampling_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), seed=0))
    c = np.asarray(sampling_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), seed=1))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)

    # subset_size > n_train clamps to n_train -> exact 1-NN distance;
    # a sampled train row scores 0 against itself
    full = np.asarray(sampling_scores_masked(
        jnp.asarray(xtr[:5]), jnp.asarray(xtr), jnp.asarray(mask),
        subset_size=999, seed=0,
    ))
    np.testing.assert_allclose(full, 0.0, atol=1e-4)
    with pytest.raises(ValueError, match="subset_size"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="sampling", subset_size=0,
        )


def test_ensemble_sampling_base(rng):
    """End-to-end SubspaceEnsemble(base='sampling'): planted mean-shift
    outliers rank above inliers; predict() works; subset_size flows."""
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(10, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(10, 1 / 10, np.float32)

    for agg in ("average", "max"):
        ens = SubspaceEnsemble(
            subs, proba, base="sampling", aggregation=agg, chunk=4,
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), agg

    ens = SubspaceEnsemble(subs, proba, base="sampling").fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()

    big = SubspaceEnsemble(
        subs, proba, base="sampling", subset_size=150,
    ).fit(xtr)
    s_big = big.decision_function(xte)
    assert s_big.shape == (40,) and np.all(np.isfinite(s_big))
    assert not np.allclose(s_big, ens.decision_function(xte))


def test_kpca_scores_match_numpy(rng):
    """kpca_scores_masked vs a direct f64 numpy transcription of the
    Hoffmann (2007) kernel-PCA novelty recipe (pyod.models.kpca's
    scoring): spherical potential in RBF feature space minus squared
    projections onto the leading centered-kernel eigenvectors."""
    from vgan_tpu.ensemble import kpca_scores_masked

    d, n_tr, nt = 7, 40, 12
    xtr = rng.normal(size=(n_tr, d)).astype(np.float32)
    xte = rng.normal(size=(nt, d)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 1, 0, 1], bool)

    def oracle(n_components=0, gamma=0.0, sampling=False,
               subset_size=20, seed=0):
        xf = xtr.astype(np.float64) * mask
        if sampling:
            s = max(2, min(subset_size, n_tr))
            idx = np.random.default_rng(seed).choice(
                n_tr, size=s, replace=False)
            xf = xf[idx]
        n = xf.shape[0]
        zt = xte.astype(np.float64) * mask
        g = gamma if gamma > 0 else 1.0 / mask.sum()

        def rbf(a, b):
            return np.exp(-g * ((a[:, None] - b[None]) ** 2).sum(-1))

        kk = rbf(xf, xf)
        rm, am = kk.mean(0), kk.mean()
        ev, al = np.linalg.eigh(kk - rm[None, :] - rm[:, None] + am)
        ev = np.maximum(ev[::-1], 0)
        al = al[:, ::-1]
        valid = ev > max(ev[0] * 1e-5, np.finfo(np.float64).tiny)
        r = int(valid.sum())
        ncomp = min(n_components, r) if n_components > 0 else r
        keep = np.zeros(n, bool)
        keep[np.flatnonzero(valid)[:ncomp]] = True
        kt = rbf(zt, xf)
        proj = (kt - kt.mean(1, keepdims=True) - rm[None, :] + am) @ al
        proj_sq = np.where(
            keep[None, :], proj ** 2 / np.maximum(ev, 1e-300)[None, :], 0.0
        )
        return 1.0 - 2.0 * kt.mean(1) + am - proj_sq.sum(1)

    for kw in (dict(), dict(n_components=5), dict(gamma=0.3),
               dict(sampling=True, subset_size=15, seed=3)):
        ours = np.asarray(kpca_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), **kw
        ))
        np.testing.assert_allclose(ours, oracle(**kw), rtol=5e-3,
                                   atol=1e-5)

    # Hoffmann sanity: train points reconstruct to ~0 with the full
    # valid spectrum (complete basis)
    tr = np.asarray(kpca_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), jnp.asarray(mask)
    ))
    assert np.abs(tr).max() < 1e-4


def test_kpca_guards(rng):
    from vgan_tpu.ensemble import kpca_scores_masked

    xte = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    mask = jnp.asarray(np.ones(4, bool))
    one = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="at least 2 fit rows"):
        kpca_scores_masked(xte, one, mask)
    with pytest.raises(ValueError, match="kpca_n_components"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="kpca", kpca_n_components=-1,
        )
    with pytest.raises(ValueError, match="kpca_gamma"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="kpca", kpca_gamma=-0.5,
        )


def test_ensemble_kpca_base(rng):
    """End-to-end SubspaceEnsemble(base='kpca'): planted mean-shift
    outliers rank above inliers; predict() works; the sampling escape
    hatch and n_components flow through."""
    d = 12
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(10, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(10, 1 / 10, np.float32)

    for kw in (dict(kpca_n_components=16),
               dict(kpca_sampling=True, subset_size=40)):
        ens = SubspaceEnsemble(
            subs, proba, base="kpca", chunk=4, **kw
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), kw

    ens = SubspaceEnsemble(
        subs, proba, base="kpca", kpca_n_components=16,
    ).fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()


def test_mcd_guards(rng):
    from vgan_tpu.ensemble import mcd_scores_masked

    xte = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    mask = jnp.asarray(np.ones(4, bool))
    one = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="at least 2 train rows"):
        mcd_scores_masked(xte, one, mask)
    with pytest.raises(ValueError, match="support_fraction"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="mcd", support_fraction=1.5,
        )
    with pytest.raises(ValueError, match="mcd_starts"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="mcd", mcd_starts=0,
        )

    # determinism per seed; robust to the planted contamination: the
    # outliers' own rows must not drag the estimate (score them high)
    xtr = np.vstack([
        rng.normal(size=(60, 4)) * 0.5, rng.normal(size=(8, 4)) + 8.0,
    ]).astype(np.float32)
    a = np.asarray(mcd_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), mask, seed=0))
    b = np.asarray(mcd_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), mask, seed=0))
    np.testing.assert_array_equal(a, b)
    assert a[60:].min() > a[:60].max()


def test_ensemble_mcd_base(rng):
    """End-to-end SubspaceEnsemble(base='mcd'): planted mean-shift
    outliers rank above inliers; predict() works; support_fraction
    flows."""
    d = 10
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(8, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)

    ens = SubspaceEnsemble(
        subs, proba, base="mcd", chunk=4, mcd_starts=4, mcd_steps=8,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[30:].mean() > scores[:30].mean()
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()

    frac = SubspaceEnsemble(
        subs, proba, base="mcd", support_fraction=0.9, mcd_starts=4,
        mcd_steps=8,
    ).fit(xtr)
    s_frac = frac.decision_function(xte)
    assert s_frac.shape == (40,) and np.all(np.isfinite(s_frac))
    assert not np.allclose(s_frac, scores)


def test_ae_learns_low_rank_structure(rng):
    """ae_scores_masked (pyod AutoEncoder semantics, trained in-program):
    on rank-3 data the AE reconstructs inliers and not off-manifold
    points; training strictly reduces the train reconstruction error
    (epochs=200 vs epochs=1); per-seed deterministic."""
    from vgan_tpu.ensemble import ae_scores_masked

    d = 12
    z = rng.normal(size=(300, 3))
    a_mix = rng.normal(size=(3, d))
    xtr = (z @ a_mix + 0.1 * rng.normal(size=(300, d))).astype(np.float32)
    inl = (rng.normal(size=(30, 3)) @ a_mix
           + 0.1 * rng.normal(size=(30, d))).astype(np.float32)
    out = rng.normal(size=(10, d)).astype(np.float32) * 3.0
    xte = np.vstack([inl, out])
    mask = np.ones(d, bool)
    mask[3] = False

    s = np.asarray(ae_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=200, lr=3e-3, seed=0,
    ))
    assert np.all(np.isfinite(s))
    assert s[30:].mean() > s[:30].mean() + 1.0

    tr_trained = np.asarray(ae_scores_masked(
        jnp.asarray(xtr[:50]), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=200, lr=3e-3, seed=0,
    ))
    tr_init = np.asarray(ae_scores_masked(
        jnp.asarray(xtr[:50]), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=1, lr=3e-3, seed=0,
    ))
    assert tr_trained.mean() < tr_init.mean()

    a = np.asarray(ae_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), epochs=20))
    b = np.asarray(ae_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), epochs=20))
    np.testing.assert_array_equal(a, b)


def test_ae_guards(rng):
    from vgan_tpu.ensemble import ae_scores_masked

    xte = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    mask = jnp.asarray(np.ones(4, bool))
    one = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="at least 2 train rows"):
        ae_scores_masked(xte, one, mask)
    with pytest.raises(ValueError, match="ae_hidden"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="ae", ae_hidden=(),
        )
    with pytest.raises(ValueError, match="ae_lr"):
        SubspaceEnsemble(
            np.ones((1, 4), bool), np.ones(1, np.float32),
            base="ae", ae_lr=0.0,
        )


def test_ensemble_ae_base(rng):
    """End-to-end SubspaceEnsemble(base='ae'): planted mean-shift
    outliers rank above inliers; predict() works; ae knobs flow."""
    d = 10
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(6, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)

    ens = SubspaceEnsemble(
        subs, proba, base="ae", ae_hidden=(16, 8), ae_epochs=60, chunk=3,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[30:].mean() > scores[:30].mean()
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()


def test_dsvdd_one_class_behavior(rng):
    """dsvdd_scores_masked (Ruff 2018 / pyod deep_svdd semantics): the
    trained embedding contracts the train distribution around the frozen
    center, so off-distribution points score higher; training reduces
    the train objective vs the init network; deterministic per seed."""
    from vgan_tpu.ensemble import dsvdd_scores_masked

    d = 12
    xtr = rng.normal(size=(300, d)).astype(np.float32)
    inl = rng.normal(size=(30, d)).astype(np.float32)
    out = (rng.normal(size=(10, d)) * 4.0 + 4.0).astype(np.float32)
    xte = np.vstack([inl, out])
    mask = np.ones(d, bool)
    mask[5] = False

    s = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=150, lr=3e-3, seed=0,
    ))
    assert np.all(np.isfinite(s))
    assert s[30:].mean() > s[:30].mean()

    tr_trained = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xtr[:50]), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=150, lr=3e-3, seed=0,
    ))
    tr_init = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xtr[:50]), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=(16, 8), epochs=1, lr=3e-3, seed=0,
    ))
    assert tr_trained.mean() < tr_init.mean()

    a = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), epochs=15))
    b = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), epochs=15))
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="at least 2 train rows"):
        dsvdd_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr[:1]), jnp.asarray(mask))


def test_ensemble_dsvdd_base(rng):
    """End-to-end SubspaceEnsemble(base='dsvdd') sharing the ae knobs."""
    d = 10
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(6, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)

    ens = SubspaceEnsemble(
        subs, proba, base="dsvdd", ae_hidden=(16, 8), ae_epochs=60,
        chunk=3,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[30:].mean() > scores[:30].mean()
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()


def _np_masked_standardize(xte, xtr, mask):
    """f64 transcription of od._masked_standardize (StandardScaler
    semantics on the masked dims, constant columns keep scale 1)."""
    mask_f = mask.astype(np.float64)
    xm_tr = xtr.astype(np.float64) * mask_f[None, :]
    mu = xm_tr.mean(axis=0)
    scale = np.sqrt(((xm_tr - mu[None, :]) ** 2).mean(axis=0))
    scale = np.where(scale > 0.0, scale, 1.0)
    z_tr = (xm_tr - mu[None, :]) / scale[None, :]
    z_te = (xte.astype(np.float64) * mask_f[None, :] - mu[None, :]) / scale[None, :]
    return z_tr, z_te


def _np_adam(params, grad_fn, epochs, lr):
    """f64 transcription of od._adam_train: full-batch Adam, standard
    bias-corrected moments, eps 1e-8 OUTSIDE the sqrt (matching the
    implementation's ``m / (sqrt(v) + eps)`` form)."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    for t in range(epochs):
        g = grad_fn(params)
        m = [b1 * a + (1 - b1) * b for a, b in zip(m, g)]
        v = [b2 * a + (1 - b2) * b * b for a, b in zip(v, g)]
        tf = float(t) + 1.0
        sz = lr * np.sqrt(1.0 - b2 ** tf) / (1.0 - b1 ** tf)
        params = [p - sz * mm / (np.sqrt(vv) + eps)
                  for p, mm, vv in zip(params, m, v)]
    return params


def test_ae_scores_match_numpy_oracle(rng):
    """ae_scores_masked vs a full f64 numpy transcription of the SAME
    fixed protocol — Glorot-uniform init from the identical host RNG
    stream, hand-derived MLP backprop (no autodiff), the exact Adam
    update of od._adam_train, re-masked reconstruction, and the
    MSE/active-dim normalization. Pinned at 1e-8 rtol, which upgrades
    the ae family to the oracle verification tier (BASES.md)."""
    from vgan_tpu.ensemble import ae_scores_masked

    d, hidden, epochs, lr, seed = 7, (6, 4), 25, 1e-3, 3
    xtr = rng.normal(size=(40, d))
    xte = rng.normal(size=(15, d)) * 1.5
    for mask in (
        np.array([1, 0, 1, 1, 0, 1, 0], bool),
        np.ones(d, bool),
    ):
        ours = np.asarray(ae_scores_masked(
            jnp.asarray(xte, jnp.float64), jnp.asarray(xtr, jnp.float64),
            jnp.asarray(mask), hidden=hidden, epochs=epochs, lr=lr,
            seed=seed,
        ))

        # ---- oracle -----------------------------------------------------
        mask_f = mask.astype(np.float64)
        z_tr, z_te = _np_masked_standardize(xte, xtr, mask)
        ntr = len(xtr)
        d_sub = max(mask_f.sum(), 1.0)
        widths = [d, *hidden, *list(reversed(hidden))[1:], d]
        host_rng = np.random.default_rng(seed)
        params = []
        for w_in, w_out in zip(widths[:-1], widths[1:]):
            lim = float(np.sqrt(6.0 / (w_in + w_out)))
            params.append(host_rng.uniform(-lim, lim, (w_in, w_out)))
            params.append(np.zeros(w_out))

        n_layers = len(widths) - 1

        def forward(ps, z):
            acts, pres = [z], []
            a = z
            for i in range(n_layers):
                pre = a @ ps[2 * i] + ps[2 * i + 1]
                pres.append(pre)
                a = np.maximum(pre, 0.0) if i < n_layers - 1 else pre
                acts.append(a)
            return acts, pres, a * mask_f[None, :]

        def grad_fn(ps):
            acts, pres, r = forward(ps, z_tr)
            # loss = sum((r - z_tr)^2) / (ntr * d_sub)
            dr = 2.0 * (r - z_tr) / (ntr * d_sub)
            da = dr * mask_f[None, :]
            g = [None] * len(ps)
            for i in reversed(range(n_layers)):
                dpre = da if i == n_layers - 1 else da * (pres[i] > 0.0)
                g[2 * i] = acts[i].T @ dpre
                g[2 * i + 1] = dpre.sum(axis=0)
                da = dpre @ ps[2 * i].T
            return g

        params = _np_adam(params, grad_fn, epochs, lr)
        _, _, r_te = forward(params, z_te)
        expected = np.sqrt(((r_te - z_te) ** 2).sum(axis=1))
        np.testing.assert_allclose(ours, expected, rtol=1e-8, atol=1e-12)


def test_dsvdd_scores_match_numpy_oracle(rng):
    """dsvdd_scores_masked vs a full f64 numpy transcription of the SAME
    fixed protocol — bias-free Glorot encoder from the identical host
    RNG stream, the frozen eps-snapped center from the INITIAL
    embedding, hand-derived backprop of the squared-distance + weight-
    decay objective, and the exact Adam update. Oracle tier for the
    second deep family (BASES.md)."""
    from vgan_tpu.ensemble import dsvdd_scores_masked

    d, hidden, epochs, lr, wd, seed = 7, (6, 4), 25, 1e-3, 1e-5, 5
    xtr = rng.normal(size=(40, d))
    xte = rng.normal(size=(15, d)) * 1.5
    for mask in (
        np.array([1, 1, 0, 0, 1, 0, 1], bool),
        np.ones(d, bool),
    ):
        ours = np.asarray(dsvdd_scores_masked(
            jnp.asarray(xte, jnp.float64), jnp.asarray(xtr, jnp.float64),
            jnp.asarray(mask), hidden=hidden, epochs=epochs, lr=lr,
            weight_decay=wd, seed=seed,
        ))

        # ---- oracle -----------------------------------------------------
        z_tr, z_te = _np_masked_standardize(xte, xtr, mask)
        ntr = len(xtr)
        widths = [d, *hidden]
        host_rng = np.random.default_rng(seed)
        params = []
        for w_in, w_out in zip(widths[:-1], widths[1:]):
            lim = float(np.sqrt(6.0 / (w_in + w_out)))
            params.append(host_rng.uniform(-lim, lim, (w_in, w_out)))

        n_layers = len(params)

        def embed(ps, z):
            acts, pres = [z], []
            a = z
            for i in range(n_layers):
                pre = a @ ps[i]
                pres.append(pre)
                a = np.maximum(pre, 0.0) if i < n_layers - 1 else pre
                acts.append(a)
            return acts, pres, a

        # frozen center: mean initial embedding, |c|<0.1 snapped to +/-0.1
        # (c0 == 0 snaps to +0.1, matching the jnp.where branch order)
        _, _, e0 = embed(params, z_tr)
        c0 = e0.mean(axis=0)
        c = np.where(np.abs(c0) < 0.1, np.where(c0 < 0, -0.1, 0.1), c0)

        def grad_fn(ps):
            acts, pres, e = embed(ps, z_tr)
            # loss = mean_i ||e_i - c||^2 + wd * sum ||W||^2
            da = 2.0 * (e - c[None, :]) / ntr
            g = [None] * n_layers
            for i in reversed(range(n_layers)):
                dpre = da if i == n_layers - 1 else da * (pres[i] > 0.0)
                g[i] = acts[i].T @ dpre + 2.0 * wd * ps[i]
                da = dpre @ ps[i].T
            return g

        params = _np_adam(params, grad_fn, epochs, lr)
        _, _, e_te = embed(params, z_te)
        expected = ((e_te - c[None, :]) ** 2).sum(axis=1)
        np.testing.assert_allclose(ours, expected, rtol=1e-8, atol=1e-12)


def test_sod_scores_match_numpy(rng):
    """sod_scores_masked vs a direct f64 numpy transcription of the
    Kriegel/pyod SOD recipe (novelty-style: shared-nearest-neighbor
    reference sets of the TRAIN kNN lists, low-variance dimension
    selection, normalized deviation), exact thanks to the deterministic
    lowest-index SNN tiebreak."""
    from vgan_tpu.ensemble import sod_scores_masked

    ntr, nt, d, k, r, alpha = 60, 15, 8, 12, 6, 0.8
    xtr = rng.normal(size=(ntr, d)).astype(np.float32)
    xte = rng.normal(size=(nt, d)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 1, 0, 1, 1], bool)

    xm = xtr.astype(np.float64) * mask
    zm = xte.astype(np.float64) * mask
    d2tr = ((xm[:, None] - xm[None]) ** 2).sum(-1)
    np.fill_diagonal(d2tr, np.inf)
    idx_tr = np.argsort(d2tr, axis=1, kind="stable")[:, :k]
    d2te = ((zm[:, None] - xm[None]) ** 2).sum(-1)
    idx_te = np.argsort(d2te, axis=1, kind="stable")[:, :k]
    t_ind = np.zeros((ntr, ntr))
    q_ind = np.zeros((nt, ntr))
    t_ind[np.arange(ntr)[:, None], idx_tr] = 1
    q_ind[np.arange(nt)[:, None], idx_te] = 1
    snn = q_ind @ t_ind.T
    want = np.zeros(nt)
    for i in range(nt):
        ref = xm[np.argsort(-snn[i], kind="stable")[:r]]
        mean, var = ref.mean(0), ref.var(0)
        ind = (var < alpha * var.sum() / mask.sum()) & mask
        if ind.sum():
            want[i] = np.sqrt(
                (ind * (zm[i] - mean) ** 2).sum() / ind.sum()
            )

    ours = np.asarray(sod_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k,
        ref_set=r, alpha=alpha,
    ))
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)

    with pytest.raises(ValueError, match="k < n_train"):
        sod_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), ntr
        )
    with pytest.raises(ValueError, match="sod_ref_set"):
        SubspaceEnsemble(
            np.ones((1, 8), bool), np.ones(1, np.float32),
            base="sod", sod_ref_set=0,
        )
    with pytest.raises(ValueError, match="sod_alpha"):
        SubspaceEnsemble(
            np.ones((1, 8), bool), np.ones(1, np.float32),
            base="sod", sod_alpha=0.0,
        )


def test_ensemble_sod_base(rng):
    """End-to-end SubspaceEnsemble(base='sod'): planted mean-shift
    outliers rank above inliers; predict() (train self-scoring through
    the exclude_self path) works."""
    d = 10
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(8, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)

    ens = SubspaceEnsemble(
        subs, proba, base="sod", k=15, chunk=4,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[30:].mean() > scores[:30].mean()
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()


def test_ensemble_loda_base(rng):
    """End-to-end SubspaceEnsemble(base='loda'): planted mean-shift
    outliers score above inliers through every aggregation, predict()
    works, and the per-subspace matrix is consistent with the
    weighted-average aggregation."""
    d = 12
    xtr = rng.normal(size=(200, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 4.0
    xte = np.vstack([inliers, outliers])

    subs = rng.uniform(size=(10, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(10, 1 / 10, np.float32)

    for agg in ("average", "max", "moa"):
        ens = SubspaceEnsemble(
            subs, proba, base="loda", aggregation=agg, chunk=4,
            n_projections=32,
        ).fit(xtr)
        scores = ens.decision_function(xte)
        assert scores[30:].mean() > scores[:30].mean(), agg

    ens = SubspaceEnsemble(subs, proba, base="loda", n_projections=32).fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (40,)
    assert labels[30:].mean() > labels[:30].mean()

    ens_raw = SubspaceEnsemble(
        subs, proba, base="loda", normalize=None, n_projections=32
    ).fit(xtr)
    s = ens_raw.per_subspace_scores(xte)
    np.testing.assert_allclose(
        (proba[:, None] * s).sum(axis=0),
        ens_raw.decision_function(xte),
        rtol=1e-4,
    )


def test_random_subspaces_properties():
    """Feature-bagging pool: pyod-convention sizes in [d//2, d-1], distinct
    dims, uniform proba, deterministic per seed."""
    from vgan_tpu.ensemble import random_subspaces

    d, n = 20, 64
    masks, proba = random_subspaces(d, n, seed=5)
    assert masks.shape == (n, d) and masks.dtype == bool
    sizes = masks.sum(axis=1)
    assert sizes.min() >= d // 2 and sizes.max() <= d - 1
    np.testing.assert_allclose(proba.sum(), 1.0, rtol=1e-6)
    assert proba.std() == 0  # uniform

    m2, _ = random_subspaces(d, n, seed=5)
    np.testing.assert_array_equal(masks, m2)
    m3, _ = random_subspaces(d, n, seed=6)
    assert (masks != m3).any()

    small, _ = random_subspaces(10, 8, seed=0, min_dims=2, max_dims=3)
    assert set(small.sum(axis=1)) <= {2, 3}

    with pytest.raises(ValueError):
        random_subspaces(5, 4, min_dims=0)
    with pytest.raises(ValueError):
        random_subspaces(5, 4, min_dims=4, max_dims=2)


def test_random_subspaces_drive_ensemble(rng):
    """The feature-bagging pool plugs into SubspaceEnsemble end-to-end."""
    from vgan_tpu.ensemble import SubspaceEnsemble, random_subspaces

    d = 8
    xtr = rng.normal(size=(100, d)).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(20, d)),
        rng.normal(size=(5, d)) + 5.0,
    ]).astype(np.float32)
    masks, proba = random_subspaces(d, 16, seed=1)
    ens = SubspaceEnsemble(masks, proba, base="knn", k=5).fit(xtr)
    s = ens.decision_function(xte)
    assert s[20:].mean() > s[:20].mean()


def test_mahalanobis_constant_columns_finite(rng):
    """A mask selecting only zero-variance train columns must yield finite
    scores (absolute ridge floor), with deviating test points scoring far
    above conforming ones — not silent Cholesky NaNs."""
    from vgan_tpu.ensemble import mahalanobis_scores_masked

    d = 6
    xtr = rng.normal(size=(40, d)).astype(np.float32)
    xtr[:, 2] = 1.0
    xtr[:, 4] = -3.0  # two constant columns
    mask = np.zeros(d, bool)
    mask[[2, 4]] = True
    xte = np.vstack([
        np.tile(np.array([0, 0, 1.0, 0, -3.0, 0], np.float32), (5, 1)),
        rng.normal(size=(5, d)).astype(np.float32) + 2.0,  # deviates
    ])
    s = np.asarray(
        mahalanobis_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)
        )
    )
    assert np.all(np.isfinite(s))
    assert s[5:].min() > s[:5].max()


def test_effective_chunk_governors():
    """Per-base chunk clamp: mahalanobis bounds chunk x d^2; streaming
    neighbor bases bound chunk x nt x block; others pass through."""
    from vgan_tpu.ensemble.od import (
        _MAHA_CHUNK_BUDGET,
        _effective_chunk,
    )

    # mahalanobis at huge d: one mask in flight
    assert _effective_chunk("mahalanobis", 128, 100, 1000, 10240) == 1
    # small d: untouched
    assert _effective_chunk("mahalanobis", 128, 100, 1000, 16) == 128
    # budget boundary
    d = 4096
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (d * d)))
    assert _effective_chunk("mahalanobis", 128, 100, 1000, d) == expect
    # non-streaming knn: untouched
    assert _effective_chunk("knn", 128, 100, 1000, 10240) == 128
    # loda/dim bases: untouched
    assert _effective_chunk("loda", 128, 100, 10 ** 6, 10240) == 128
    # inne: (T*psi) x d center copy + nt x T x psi coverage planes
    tp = 100 * 8
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (tp * 10240 + 4096 * tp)))
    assert _effective_chunk("inne", 128, 4096, 10 ** 6, 10240) == expect
    # pca: standardized train copy + projections + (d, d) spectrum +
    # query projections
    ntr, nt, d = 10 ** 5, 4096, 2048
    expect = max(1, min(
        128, _MAHA_CHUNK_BUDGET // (2 * ntr * d + 2 * d * d + nt * d)
    ))
    assert _effective_chunk("pca", 128, nt, ntr, d) == expect
    assert _effective_chunk("pca", 128, 100, 1000, 16) == 128
    # kpca: (n, n) kernel planes + eigh workspace + (nt, n) test planes;
    # sampling=True bounds n at subset_size
    n, nt = 20000, 4096
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (4 * n * n + 3 * nt * n)))
    assert _effective_chunk("kpca", 128, nt, n, 64) == expect
    assert _effective_chunk(
        "kpca", 128, 100, n, 64, kpca_sampling=True, subset_size=256
    ) == max(1, min(128, _MAHA_CHUNK_BUDGET // (4 * 256 * 256 + 3 * 100 * 256)))
    # mcd: per-start solve/cov planes, vmapped over starts
    ntr, nt, d = 10 ** 5, 4096, 512
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (
        ntr * d + 8 * (2 * ntr * d + 2 * d * d) + nt * d)))
    assert _effective_chunk("mcd", 128, nt, ntr, d) == expect
    assert _effective_chunk("mcd", 128, 50, 500, 8) == 128
    # ae: weights + Adam state + train/test activation planes
    ntr, nt, d, h = 10 ** 5, 4096, 512, (64, 32)
    w = 2 * (d * 64 + 64 * 32)
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (
        6 * w + 4 * ntr * (d + 96) + nt * (d + 96))))
    assert _effective_chunk("ae", 128, nt, ntr, d) == expect
    assert _effective_chunk("ae", 128, 50, 500, 8) == 128
    # sod: (ntr, ntr) indicator planes + (nt, ntr) SNN planes + ref block
    ntr, nt, d, r = 10 ** 4, 4096, 512, 10
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // (
        2 * ntr * ntr + 3 * nt * ntr + nt * r * d)))
    assert _effective_chunk("sod", 128, nt, ntr, d) == expect
    assert _effective_chunk("sod", 128, 20, 200, 8) == 128


def test_hetero_combine_backend_parity(rng):
    """hetero._standardize/_combine produce the same results through the
    numpy and jax.numpy backends (the live path and the exported program
    share this code — parity here is what keeps them in lockstep)."""
    from vgan_tpu.ensemble.hetero import _combine, _standardize

    s = rng.normal(size=(4, 30)).astype(np.float32)
    for combination in ("average", "max", "select"):
        a, wa = _combine(_standardize(s.astype(np.float64)), combination)
        b, wb = _combine(
            _standardize(jnp.asarray(s), xp=jnp), combination, xp=jnp
        )
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-5, atol=1e-6)
        if combination == "select":
            np.testing.assert_allclose(
                np.asarray(wb), wa, rtol=1e-5, atol=1e-6
            )
        else:
            assert wa is None and wb is None


def test_decision_scores_and_labels_pyod_attributes(rng):
    """pyod BaseDetector parity: decision_scores_ (train scores, self-pairs
    excluded for neighbor bases) and labels_ (fit-time contamination
    quantile) on both ensemble classes — lazy, cached, reset by fit()."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    d = 8
    xtr = np.vstack([
        rng.normal(size=(90, d)),
        rng.normal(size=(10, d)) + 4.0,  # planted train outliers
    ]).astype(np.float32)
    masks = rng.uniform(size=(6, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)

    ens = SubspaceEnsemble(masks, proba, base="knn", k=5,
                           contamination=0.1).fit(xtr)
    s = ens.decision_scores_
    assert s.shape == (100,)
    # oracle: decision_function with exclude_self on the train set
    np.testing.assert_allclose(
        s, ens.decision_function(xtr, exclude_self=True), rtol=1e-5
    )
    assert s is ens.decision_scores_  # cached
    labels = ens.labels_
    assert labels.sum() <= 10 + 1  # ~contamination fraction flagged
    assert labels[90:].mean() > labels[:90].mean()  # outliers flagged
    # pyod invariant: computing labels_ sets threshold_ consistently
    assert ens.threshold_ is not None
    np.testing.assert_array_equal(
        labels, (ens.decision_scores_ > ens.threshold_).astype(np.int64)
    )

    ens.fit(xtr[:50])  # refit resets the cache
    assert ens.decision_scores_.shape == (50,)

    het = HeterogeneousEnsemble(
        masks, proba, members=[{"base": "knn", "k": 5}, {"base": "ecod"}],
        contamination=0.1,
    ).fit(xtr)
    hs = het.decision_scores_
    assert hs.shape == (100,)
    hl = het.labels_
    assert hl[90:].mean() > hl[:90].mean()


def test_predict_proba_pyod_semantics(rng):
    """predict_proba: (n, 2) rows summing to 1, probabilities in [0, 1],
    'linear' matching a hand-computed min-max of train scores, 'unify'
    matching the erf unification, outliers getting higher P(outlier)."""
    from scipy.special import erf

    d = 8
    xtr = rng.normal(size=(80, d)).astype(np.float32)
    inliers = rng.normal(size=(15, d)).astype(np.float32)
    outliers = rng.normal(size=(5, d)).astype(np.float32) + 5.0
    xte = np.vstack([inliers, outliers])
    masks = rng.uniform(size=(5, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2, np.float32)

    ens = SubspaceEnsemble(masks, proba, base="knn", k=5,
                           normalize=None).fit(xtr)
    for method in ("linear", "unify"):
        p = ens.predict_proba(xte, method=method)
        assert p.shape == (20, 2)
        assert np.all((p >= 0) & (p <= 1))
        np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)
        assert p[15:, 1].mean() > p[:15, 1].mean()

    tr = ens.decision_scores_.astype(np.float64)
    te = ens.decision_function(xte).astype(np.float64)
    lin = np.clip((te - tr.min()) / (tr.max() - tr.min()), 0, 1)
    np.testing.assert_allclose(
        ens.predict_proba(xte, "linear")[:, 1], lin, rtol=1e-5, atol=1e-6
    )
    uni = np.clip(erf((te - tr.mean()) / (tr.std() * np.sqrt(2))), 0, 1)
    np.testing.assert_allclose(
        ens.predict_proba(xte, "unify")[:, 1], uni, rtol=1e-5, atol=1e-6
    )

    with pytest.raises(ValueError, match="linear"):
        ens.predict_proba(xte, method="nope")

    from vgan_tpu.ensemble import HeterogeneousEnsemble

    het = HeterogeneousEnsemble(
        masks, proba, members=[{"base": "knn", "k": 5}, {"base": "ecod"}]
    ).fit(xtr)
    hp = het.predict_proba(xte, "unify")
    assert hp.shape == (20, 2) and np.all((hp >= 0) & (hp <= 1))
    assert hp[15:, 1].mean() > hp[:15, 1].mean()


def test_kde_full_mask_matches_sklearn(rng):
    """base='kde' with a full mask == -KernelDensity.score_samples exactly
    (same gaussian kernel, same normalization)."""
    sk = pytest.importorskip("sklearn.neighbors")
    from vgan_tpu.ensemble import kde_scores_masked

    d = 5
    xtr = rng.normal(size=(60, d)).astype(np.float32)
    xte = rng.normal(size=(25, d)).astype(np.float32)
    for h in (0.7, 1.0, 2.5):
        ours = np.asarray(kde_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(np.ones(d, bool)),
            bandwidth=h,
        ))
        kd = sk.KernelDensity(bandwidth=h).fit(xtr)
        np.testing.assert_allclose(
            ours, -kd.score_samples(xte), rtol=1e-4, atol=1e-5
        )


def test_kde_masked_matches_sklearn_on_subspace(rng):
    """A masked KDE score equals sklearn KDE fitted on the PROJECTED data
    (masking == projection for density in the selected dims)."""
    sk = pytest.importorskip("sklearn.neighbors")
    from vgan_tpu.ensemble import kde_scores_masked

    d = 8
    xtr = rng.normal(size=(50, d)).astype(np.float32)
    xte = rng.normal(size=(20, d)).astype(np.float32)
    mask = np.zeros(d, bool)
    mask[[1, 4, 6]] = True
    ours = np.asarray(kde_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), bandwidth=1.3
    ))
    kd = sk.KernelDensity(bandwidth=1.3).fit(xtr[:, mask])
    np.testing.assert_allclose(
        ours, -kd.score_samples(xte[:, mask]), rtol=1e-4, atol=1e-5
    )


def test_kde_streaming_matches_dense(rng, monkeypatch):
    """Past STREAM_NTR the running-max logsumexp carry must agree with the
    dense path exactly (incl. exclude_self)."""
    import vgan_tpu.ensemble.od as od
    from vgan_tpu.ensemble import kde_scores_masked

    xtr = rng.normal(size=(70, 6)).astype(np.float32)
    xte = jnp.asarray(xtr[:20])  # leading rows ARE train rows
    mask = np.array([1, 0, 1, 1, 0, 1], bool)
    for excl in (False, True):
        dense = np.asarray(kde_scores_masked(
            xte, jnp.asarray(xtr), jnp.asarray(mask), bandwidth=0.9,
            exclude_self=excl,
        ))
        monkeypatch.setattr(od, "STREAM_NTR", 32)
        monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
        stream = np.asarray(kde_scores_masked(
            xte, jnp.asarray(xtr), jnp.asarray(mask), bandwidth=0.9,
            exclude_self=excl,
        ))
        monkeypatch.undo()
        np.testing.assert_allclose(stream, dense, rtol=1e-5, atol=1e-6)


def test_ensemble_kde_base(rng):
    """End-to-end SubspaceEnsemble(base='kde'): outliers rank above
    inliers, predict works, per-subspace consistency, pyod attributes."""
    d = 10
    xtr = rng.normal(size=(150, d)).astype(np.float32)
    inliers = rng.normal(size=(30, d)).astype(np.float32)
    outliers = rng.normal(size=(10, d)).astype(np.float32) + 3.5
    xte = np.vstack([inliers, outliers])
    subs = rng.uniform(size=(8, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)

    ens = SubspaceEnsemble(
        subs, proba, base="kde", kde_bandwidth=1.2, chunk=3
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[30:].mean() > scores[:30].mean()
    labels = ens.predict(xte)
    assert labels[30:].mean() > labels[:30].mean()
    assert np.all(np.isfinite(ens.decision_scores_))

    ens_raw = SubspaceEnsemble(
        subs, proba, base="kde", normalize=None, kde_bandwidth=1.2
    ).fit(xtr)
    s = ens_raw.per_subspace_scores(xte)
    np.testing.assert_allclose(
        (proba[:, None] * s).sum(axis=0),
        ens_raw.decision_function(xte),
        rtol=1e-4,
    )


def test_kde_streaming_through_ensemble(rng, monkeypatch):
    """SubspaceEnsemble(base='kde') through the streaming regime (vmapped
    mask chunks over the train-block scan, _effective_chunk governing),
    against a numpy logsumexp oracle — traced AFTER the monkeypatch with a
    fresh chunk so the jit cache cannot return a dense executable."""
    import vgan_tpu.ensemble.od as od

    d = 6
    xtr = rng.normal(size=(70, d)).astype(np.float32)
    xte = rng.normal(size=(15, d)).astype(np.float32)
    masks = rng.uniform(size=(7, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(7, 1 / 7)
    h = 1.1

    monkeypatch.setattr(od, "STREAM_NTR", 32)
    monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
    assert od._effective_chunk("kde", 128, 15, 70, d) <= 128  # governed
    ens = SubspaceEnsemble(masks, proba, base="kde", kde_bandwidth=h,
                           chunk=5, normalize=None).fit(xtr)
    got = ens.decision_function(xte)

    per = []
    for m in masks:
        d2 = ((xte[:, None, m] - xtr[None, :, m]) ** 2).sum(-1)
        ll = np.log(np.exp(-d2 / (2 * h * h)).sum(axis=1))
        d_sub = m.sum()
        per.append(-(ll - np.log(70) - 0.5 * d_sub * np.log(2 * np.pi * h * h)))
    expected = (proba[:, None] * np.stack(per)).sum(axis=0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_kde_bandwidth_validation():
    import pytest as _pytest

    masks = np.ones((2, 4), bool)
    proba = np.full(2, 0.5, np.float32)
    for bad in (0, -1.5):
        with _pytest.raises(ValueError, match="kde_bandwidth"):
            SubspaceEnsemble(masks, proba, base="kde", kde_bandwidth=bad)


def test_heterogeneous_member_specific_kwargs(rng):
    """Member dicts thread base-specific hyperparameters (kde_bandwidth,
    n_projections) to their own SubspaceEnsemble without leaking to
    siblings."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    d = 6
    xtr = rng.normal(size=(60, d)).astype(np.float32)
    xte = rng.normal(size=(12, d)).astype(np.float32)
    masks = rng.uniform(size=(4, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(4, 0.25, np.float32)

    het = HeterogeneousEnsemble(
        masks, proba,
        members=[{"base": "kde", "kde_bandwidth": 2.5},
                 {"base": "loda", "n_projections": 16}],
    ).fit(xtr)
    assert het.members[0].kde_bandwidth == 2.5
    assert het.members[1].n_projections == 16
    assert het.members[1].kde_bandwidth == 1.0  # default, not leaked
    s = het.decision_function(xte)
    assert s.shape == (12,) and np.all(np.isfinite(s))


def test_heterogeneous_per_member_pools(rng):
    """A member dict may carry its OWN subspaces/proba — e.g. a learned
    pool combined with a feature-bagging pool — without affecting the
    siblings or the shared default."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble, random_subspaces

    d = 8
    xtr = rng.normal(size=(80, d)).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(15, d)),
        rng.normal(size=(5, d)) + 4.0,
    ]).astype(np.float32)
    learned = rng.uniform(size=(5, d)) < 0.5
    learned[~learned.any(axis=1), 0] = True
    learned_p = np.full(5, 0.2, np.float32)
    fb_masks, fb_proba = random_subspaces(d, 12, seed=4)

    het = HeterogeneousEnsemble(
        learned, learned_p,
        members=[
            {"base": "knn", "k": 5},
            {"base": "knn", "k": 5, "subspaces": fb_masks, "proba": fb_proba},
        ],
    ).fit(xtr)
    assert het.members[0].subspaces.shape == (5, d)
    assert het.members[1].subspaces.shape == (12, d)
    s = het.decision_function(xte)
    assert s[15:].mean() > s[:15].mean()
    # exported program embeds each member's own pool
    import tempfile

    from vgan_tpu.serving import export_hetero_scorer, load_ensemble_scorer

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/het_pools.bin"
        export_hetero_scorer(het, path)
        fn = load_ensemble_scorer(path)
        np.testing.assert_allclose(
            fn(xte), het.decision_function(xte), rtol=2e-4, atol=1e-5
        )


def test_test_chunked_scores_match_one_shot(rng):
    """test_chunk slicing is EXACT vs one-shot scoring for every
    normalize x aggregation combination and base family (incl. the global
    zscore moments and the seeded bucket assignment)."""
    d = 7
    xtr = rng.normal(size=(80, d)).astype(np.float32)
    xte = rng.normal(size=(33, d)).astype(np.float32)  # not a multiple of 7
    masks = rng.uniform(size=(9, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = rng.random(9).astype(np.float32)
    proba /= proba.sum()

    for base, kw in (("knn", dict(k=5)), ("ecod", {}),
                     ("kde", dict(kde_bandwidth=1.2))):
        for normalize in ("zscore", None):
            for agg in ("average", "max", "aom"):
                one = SubspaceEnsemble(
                    masks, proba, base=base, aggregation=agg,
                    normalize=normalize, **kw,
                ).fit(xtr).decision_function(xte)
                chunked = SubspaceEnsemble(
                    masks, proba, base=base, aggregation=agg,
                    normalize=normalize, test_chunk=7, **kw,
                ).fit(xtr).decision_function(xte)
                np.testing.assert_allclose(
                    chunked, one, rtol=1e-4, atol=1e-6,
                    err_msg=f"{base}/{normalize}/{agg}",
                )


def test_test_chunk_validation_and_predict_bypass(rng):
    import pytest as _pytest

    masks = np.ones((2, 4), bool)
    proba = np.full(2, 0.5, np.float32)
    with _pytest.raises(ValueError, match="test_chunk"):
        SubspaceEnsemble(masks, proba, test_chunk=0)

    # predict (exclude_self combined batch) bypasses chunking and works
    xtr = rng.normal(size=(30, 4)).astype(np.float32)
    xte = rng.normal(size=(10, 4)).astype(np.float32) + 3.0
    ens = SubspaceEnsemble(masks, proba, base="knn", k=3,
                           test_chunk=8).fit(xtr)
    labels = ens.predict(xte)
    assert labels.shape == (10,)


def test_heterogeneous_test_chunk_threads_to_members(rng):
    """shared test_chunk reaches every member; chunked hetero scoring
    matches the unchunked combination exactly."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    d = 6
    xtr = rng.normal(size=(50, d)).astype(np.float32)
    xte = rng.normal(size=(23, d)).astype(np.float32)
    masks = rng.uniform(size=(5, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2, np.float32)
    members = [{"base": "knn", "k": 4}, {"base": "ecod"}]

    one = HeterogeneousEnsemble(masks, proba, members=members).fit(xtr)
    chunked = HeterogeneousEnsemble(
        masks, proba, members=members, test_chunk=7
    ).fit(xtr)
    assert all(m.test_chunk == 7 for m in chunked.members)
    np.testing.assert_allclose(
        chunked.decision_function(xte), one.decision_function(xte),
        rtol=1e-4, atol=1e-6,
    )


def test_pool_length_and_test_chunk_validation():
    """Mismatched subspaces/proba lengths and non-int test_chunk raise
    loudly (silent mis-weighting after chunk padding otherwise)."""
    masks = np.ones((3, 4), bool)
    with pytest.raises(ValueError, match="disagree"):
        SubspaceEnsemble(masks, np.full(2, 0.5, np.float32))
    with pytest.raises(ValueError, match="test_chunk"):
        SubspaceEnsemble(masks, np.full(3, 1 / 3, np.float32), test_chunk=7.5)

    from vgan_tpu.ensemble import HeterogeneousEnsemble

    with pytest.raises(ValueError, match="BOTH"):
        HeterogeneousEnsemble(
            masks, np.full(3, 1 / 3, np.float32),
            members=[{"base": "knn", "subspaces": np.ones((5, 4), bool)}],
        )


def test_test_chunk_applies_to_nonneighbor_exclude_self(rng, monkeypatch):
    """decision_scores_ (exclude_self=True through the mixin) must STILL
    chunk for non-neighbor bases — exclude_self is a no-op there and the
    memory bound is the point of test_chunk."""
    import vgan_tpu.ensemble.od as od

    d = 5
    xtr = rng.normal(size=(33, d)).astype(np.float32)
    masks = rng.uniform(size=(4, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(4, 0.25, np.float32)

    calls = {"n": 0}
    orig = SubspaceEnsemble._raw_per_subspace

    def counting(self, x, exclude_self=False):
        calls["n"] += 1
        return orig(self, x, exclude_self=exclude_self)

    monkeypatch.setattr(SubspaceEnsemble, "_raw_per_subspace", counting)
    ens = SubspaceEnsemble(masks, proba, base="ecod", test_chunk=7).fit(xtr)
    s = ens.decision_scores_  # 33 rows -> 5 slices through the chunked path
    assert s.shape == (33,)
    assert calls["n"] >= 5  # sliced, not one-shot

    # agreement with the unchunked scores
    one = SubspaceEnsemble(masks, proba, base="ecod").fit(xtr)
    np.testing.assert_allclose(s, one.decision_scores_, rtol=1e-4, atol=1e-6)


def test_test_chunk_recompute_path_exact(rng, monkeypatch):
    """With the host cache budget forced to zero, native bases recompute
    the slices — still exact vs one-shot."""
    import vgan_tpu.ensemble.od as od

    d = 6
    xtr = rng.normal(size=(40, d)).astype(np.float32)
    xte = rng.normal(size=(19, d)).astype(np.float32)
    masks = rng.uniform(size=(5, d)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2, np.float32)

    monkeypatch.setattr(od, "_TEST_CHUNK_CACHE_ELEMS", 1)
    chunked = SubspaceEnsemble(
        masks, proba, base="knn", k=4, test_chunk=6
    ).fit(xtr).decision_function(xte)
    one = SubspaceEnsemble(
        masks, proba, base="knn", k=4
    ).fit(xtr).decision_function(xte)
    np.testing.assert_allclose(chunked, one, rtol=1e-4, atol=1e-6)


def _abod_oracle(xte, xtr, mask, k, exclude_self=False):
    """Literal FastABOD (Kriegel et al. 2008 / pyod method='fast'):
    variance over neighbor pairs of inner products weighted by inverse
    squared norms, in the masked subspace, computed in float64."""
    import itertools

    xt = xtr[:, mask].astype(np.float64)
    xq = xte[:, mask].astype(np.float64)
    out = []
    for i, x in enumerate(xq):
        d2 = ((xt - x) ** 2).sum(1)
        if exclude_self:
            d2[i] = np.inf
        nbr = np.argsort(d2)[:k]
        w = []
        for a, b in itertools.combinations(nbr, 2):
            va, vb = xt[a] - x, xt[b] - x
            w.append(np.dot(va, vb) / (np.dot(va, va) * np.dot(vb, vb)))
        out.append(-np.var(w))
    return np.array(out)


def test_abod_scores_match_numpy(rng):
    """abod_scores_masked == the literal pairwise-combinations FastABOD in
    the masked subspace (f64 oracle; f32 device accumulation tolerance),
    and unmasked features are exactly inert."""
    from vgan_tpu.ensemble import abod_scores_masked

    xtr = rng.normal(size=(60, 7)).astype(np.float32)
    xte = rng.normal(size=(15, 7)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0], bool)
    k = 6

    ours = np.asarray(
        abod_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k
        )
    )
    np.testing.assert_allclose(
        ours, _abod_oracle(xte, xtr, mask, k), rtol=3e-2
    )

    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 50.0
    ours_noisy = np.asarray(
        abod_scores_masked(
            jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask), k
        )
    )
    np.testing.assert_allclose(ours_noisy, ours, rtol=1e-5)


def test_abod_exclude_self_matches_numpy(rng):
    """exclude_self drops the positional (i, i) pair: scoring the train
    rows themselves matches the oracle with the self-distance at +inf."""
    from vgan_tpu.ensemble import abod_scores_masked

    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    ours = np.asarray(
        abod_scores_masked(
            jnp.asarray(xtr), jnp.asarray(xtr), jnp.asarray(mask), 5,
            exclude_self=True,
        )
    )
    np.testing.assert_allclose(
        ours, _abod_oracle(xtr, xtr, mask, 5, exclude_self=True), rtol=3e-2
    )


def test_abod_k_guard():
    """The angle variance is over neighbor PAIRS — k < 2 must fail loudly
    (a silent k=1 run would return -0.0 for every point)."""
    from vgan_tpu.ensemble import abod_scores_masked

    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="k >= 2"):
        abod_scores_masked(x, x, jnp.ones(3, bool), 1)


def test_abod_streaming_matches_dense(rng, monkeypatch):
    """Past STREAM_NTR the abod neighbor search streams the train axis
    (same running k-smallest merge as knn) — identical scores."""
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(90, 7)).astype(np.float32)
    xte = rng.normal(size=(25, 7)).astype(np.float32)
    mask = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 0], bool))

    monkeypatch.setattr(od, "STREAM_NTR", 40)
    monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
    stream = od.abod_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), mask, 5)
    monkeypatch.setattr(od, "STREAM_NTR", 10**9)
    dense = od.abod_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), mask, 5)
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(dense), rtol=1e-5, atol=1e-9
    )


def test_ensemble_abod_base(rng):
    """End-to-end SubspaceEnsemble(base='abod'): planted far outliers rank
    above inliers under every aggregation, predict() flags them (the
    exclude_self path), and the chunk governor keeps scores exact."""
    xtr = rng.normal(size=(80, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte_out = xte_in[:5] + np.array([8.0, 8, 0, 8, 0, 8], np.float32)
    xte = np.concatenate([xte_in, xte_out])
    masks = rng.uniform(size=(7, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(7, 1 / 7)

    for agg in ("average", "max", "aom", "moa"):
        ens = SubspaceEnsemble(
            masks, proba, base="abod", k=8, aggregation=agg, chunk=3
        ).fit(xtr)
        s = ens.decision_function(xte)
        assert s[20:].min() > np.median(s[:20]), agg

    ens = SubspaceEnsemble(
        masks, proba, base="abod", k=8, contamination=0.2
    ).fit(xtr)
    labels = ens.predict(xte)
    assert labels[20:].all()

    # per-mask chunk=1 vs one chunk: identical raw per-subspace scores
    a = SubspaceEnsemble(masks, proba, base="abod", k=8, chunk=1,
                         normalize=None).fit(xtr)
    b = SubspaceEnsemble(masks, proba, base="abod", k=8, chunk=64,
                         normalize=None).fit(xtr)
    np.testing.assert_allclose(
        a.per_subspace_scores(xte), b.per_subspace_scores(xte),
        rtol=1e-5, atol=1e-9,
    )


def _cof_oracle(xte, xtr, mask, k, exclude_self=False):
    """Literal pyod COF (cof.py _cof_memory, Tang et al. 2002) generalized
    to novelty scoring in f64 on the masked dims: each query chains through
    its k nearest train rows (itself as the chain root, ascending-distance
    order; the cost of adding a point is its min distance to the prefix);
    ac_dist of a train row always excludes its self pair (pyod's
    sbn_path[1:]). With xte is xtr and exclude_self=True this IS pyod's
    fit-time decision_scores_ algorithm."""
    xt = xtr[:, mask].astype(np.float64)
    xq = xte[:, mask].astype(np.float64)

    def ac_and_nbr(q, d_row, self_i=None):
        d = d_row.copy()
        if self_i is not None:
            d[self_i] = np.inf
        nbr = np.argsort(d)[:k]
        pts = np.vstack([q[None], xt[nbr]])  # chain: root, then neighbors
        D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        cost = np.array([D[j, :j].min() for j in range(1, k + 1)])
        w = 2.0 * (k + 1 - np.arange(1, k + 1)) / ((k + 1) * k)
        return float((cost * w).sum()), nbr

    ac_tr = np.zeros(len(xt))
    for i in range(len(xt)):
        d_row = np.sqrt(((xt - xt[i]) ** 2).sum(1))
        ac_tr[i], _ = ac_and_nbr(xt[i], d_row, self_i=i)
    out = []
    for i, q in enumerate(xq):
        d_row = np.sqrt(((xt - q) ** 2).sum(1))
        ac, nbr = ac_and_nbr(q, d_row, self_i=i if exclude_self else None)
        out.append(ac * k / ac_tr[nbr].sum())
    return np.array(out)


def test_cof_scores_match_numpy(rng):
    """cof_scores_masked == the literal pyod chaining algorithm in the
    masked subspace (f64 oracle; f32 device tolerance), and unmasked
    features are exactly inert."""
    from vgan_tpu.ensemble import cof_scores_masked

    xtr = rng.normal(size=(60, 7)).astype(np.float32)
    xte = rng.normal(size=(15, 7)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0], bool)
    k = 6

    ours = np.asarray(
        cof_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k
        )
    )
    np.testing.assert_allclose(
        ours, _cof_oracle(xte, xtr, mask, k), rtol=1e-3
    )

    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 50.0
    ours_noisy = np.asarray(
        cof_scores_masked(
            jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask), k
        )
    )
    np.testing.assert_allclose(ours_noisy, ours, rtol=1e-5)


def test_cof_exclude_self_matches_numpy(rng):
    """Scoring the train rows with exclude_self=True equals pyod COF's
    fit-time decision_scores_ (the transductive X-vs-X algorithm) on the
    projected dims — and the typical score sits near 1 (the chaining
    ratio's natural scale)."""
    from vgan_tpu.ensemble import cof_scores_masked

    xtr = rng.normal(size=(40, 6)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    ours = np.asarray(
        cof_scores_masked(
            jnp.asarray(xtr), jnp.asarray(xtr), jnp.asarray(mask), 5,
            exclude_self=True,
        )
    )
    np.testing.assert_allclose(
        ours, _cof_oracle(xtr, xtr, mask, 5, exclude_self=True), rtol=1e-3
    )
    assert 0.5 < np.median(ours) < 2.0


def test_cof_k_guard():
    """k < 1 must fail loudly (an empty chaining set has no ac_dist)."""
    from vgan_tpu.ensemble import cof_scores_masked

    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="k >= 1"):
        cof_scores_masked(x, x, jnp.ones(3, bool), 0)


def test_cof_k_ge_n_train_guard(rng):
    """k >= n_train must fail loudly: the always-on train-chain pass drops
    the self pair, so only n_train-1 true neighbors exist — beyond that the
    diagonal-masked self row (distance 0) would silently deflate ac_tr
    (round-3 advisor finding; pyod clamps to n_samples-1 instead)."""
    from vgan_tpu.ensemble import cof_scores_masked

    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    mask = jnp.ones(3, bool)
    with pytest.raises(ValueError, match="k < n_train"):
        cof_scores_masked(x, x, mask, 5)
    # k == n_train - 1 is the largest legal chaining set
    out = cof_scores_masked(x, x, mask, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cof_streaming_matches_dense(rng, monkeypatch):
    """Past STREAM_NTR both cof neighbor searches (train chains + query
    chains) stream the train axis — identical scores."""
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(90, 7)).astype(np.float32)
    xte = rng.normal(size=(25, 7)).astype(np.float32)
    mask = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 0], bool))

    monkeypatch.setattr(od, "STREAM_NTR", 40)
    monkeypatch.setattr(od, "_STREAM_BLOCK", 32)
    stream = od.cof_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), mask, 5)
    monkeypatch.setattr(od, "STREAM_NTR", 10**9)
    dense = od.cof_scores_masked(jnp.asarray(xte), jnp.asarray(xtr), mask, 5)
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(dense), rtol=1e-5, atol=1e-9
    )


def test_ensemble_cof_base(rng):
    """End-to-end SubspaceEnsemble(base='cof'): planted far outliers rank
    above inliers under every aggregation, predict() flags them (the
    exclude_self path), and chunking keeps per-subspace scores exact."""
    xtr = rng.normal(size=(80, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte_out = xte_in[:5] + np.array([8.0, 8, 0, 8, 0, 8], np.float32)
    xte = np.concatenate([xte_in, xte_out])
    masks = rng.uniform(size=(7, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(7, 1 / 7)

    for agg in ("average", "max", "aom", "moa"):
        ens = SubspaceEnsemble(
            masks, proba, base="cof", k=8, aggregation=agg, chunk=3
        ).fit(xtr)
        s = ens.decision_function(xte)
        assert s[20:].min() > np.median(s[:20]), agg

    ens = SubspaceEnsemble(
        masks, proba, base="cof", k=8, contamination=0.2
    ).fit(xtr)
    labels = ens.predict(xte)
    assert labels[20:].all()

    a = SubspaceEnsemble(masks, proba, base="cof", k=8, chunk=1,
                         normalize=None).fit(xtr)
    b = SubspaceEnsemble(masks, proba, base="cof", k=8, chunk=64,
                         normalize=None).fit(xtr)
    np.testing.assert_allclose(
        a.per_subspace_scores(xte), b.per_subspace_scores(xte),
        rtol=1e-5, atol=1e-9,
    )


def _cblof_oracle(xte, xtr, mask, n_clusters, alpha, beta, iters, seed):
    """Literal CBLOF (He, Xu & Deng 2003 / pyod use_weights=False) in f64 on
    the masked dims, sharing only the scorer's seeded init rows: fixed-iter
    Lloyd, pyod's alpha/beta large-cluster split over size-sorted clusters,
    own-centroid distance for large members, nearest-LARGE-centroid
    distance for small members."""
    import jax

    xt = (xtr * mask).astype(np.float64)
    xq = (xte * mask).astype(np.float64)
    n = len(xt)
    init = np.asarray(jax.random.choice(
        jax.random.PRNGKey(seed), n, (n_clusters,), replace=False
    ))
    cen = xt[init].copy()
    for _ in range(iters):
        d2 = ((xt[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for c in range(n_clusters):
            if (lab == c).any():
                cen[c] = xt[lab == c].mean(0)
    lab = ((xt[:, None, :] - cen[None, :, :]) ** 2).sum(-1).argmin(1)
    sizes = np.bincount(lab, minlength=n_clusters)
    order = np.argsort(-sizes, kind="stable")
    ss = sizes[order]
    alpha_idx = [i for i in range(1, n_clusters) if ss[:i].sum() >= alpha * n]
    beta_idx = [i for i in range(1, n_clusters)
                if ss[i - 1] >= beta * max(ss[i], 1e-9)]
    both = sorted(set(alpha_idx) & set(beta_idx))
    thr = (both or alpha_idx or beta_idx or [n_clusters])[0]
    large = np.zeros(n_clusters, bool)
    large[order[:thr]] = True

    d2q = ((xq[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
    labq = d2q.argmin(1)
    own = np.sqrt(d2q[np.arange(len(xq)), labq])
    nearest_large = np.sqrt(np.where(large[None, :], d2q, np.inf).min(1))
    return np.where(large[labq], own, nearest_large)


def test_cblof_scores_match_numpy(rng):
    """cblof_scores_masked == the literal CBLOF oracle sharing only the
    seeded init (f64 oracle vs f32 device math), on data with a genuine
    large/small cluster structure; unmasked features are exactly inert."""
    from vgan_tpu.ensemble import cblof_scores_masked

    a = rng.normal(size=(70, 7)) + 4
    b = rng.normal(size=(60, 7)) - 4
    c = rng.normal(size=(5, 7)) * 0.2 + 15
    xtr = np.concatenate([a, b, c]).astype(np.float32)
    xte = np.concatenate([
        rng.normal(size=(10, 7)) + 4, rng.normal(size=(4, 7)) + 15,
    ]).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 1], bool)

    kw = dict(n_clusters=4, alpha=0.9, beta=5.0, kmeans_iter=20,
              cluster_seed=3)
    ours = np.asarray(cblof_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_clusters=4, alpha=0.9, beta=5.0, kmeans_iter=20, cluster_seed=3,
    ))
    oracle = _cblof_oracle(xte, xtr, mask, kw["n_clusters"], kw["alpha"],
                           kw["beta"], kw["kmeans_iter"], kw["cluster_seed"])
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-4)

    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 50.0
    noisy = np.asarray(cblof_scores_masked(
        jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask),
        n_clusters=4, alpha=0.9, beta=5.0, kmeans_iter=20, cluster_seed=3,
    ))
    np.testing.assert_allclose(noisy, ours, rtol=1e-5)


def test_cblof_guards():
    """n_clusters < 2 and n_clusters > n_train fail loudly at the scorer,
    and the ensemble constructor validates alpha/beta/n_clusters."""
    from vgan_tpu.ensemble import cblof_scores_masked

    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="n_clusters >= 2"):
        cblof_scores_masked(x, x, jnp.ones(3, bool), n_clusters=1)
    with pytest.raises(ValueError, match="n_clusters <= n_train"):
        cblof_scores_masked(x, x, jnp.ones(3, bool), n_clusters=5)
    masks = np.ones((2, 3), bool)
    proba = np.full(2, 0.5)
    with pytest.raises(ValueError, match="cluster_alpha"):
        SubspaceEnsemble(masks, proba, base="cblof", cluster_alpha=1.5)
    with pytest.raises(ValueError, match="cluster_beta"):
        SubspaceEnsemble(masks, proba, base="cblof", cluster_beta=0.5)
    with pytest.raises(ValueError, match="n_clusters >= 2"):
        SubspaceEnsemble(masks, proba, base="cblof", n_clusters=1)


def test_cblof_all_large_fallback(rng):
    """When neither the alpha nor the beta rule fires (pyod raises), the
    scorer degrades to all-clusters-large: every point scores its
    own-centroid distance, so scores stay finite and well-ordered."""
    from vgan_tpu.ensemble import cblof_scores_masked

    # alpha=1.0 needs the cumulative sum to reach EXACTLY n (only at the
    # last boundary when every cluster is non-empty and... with 2 equal
    # clusters alpha fires at i=1 iff s0 >= n, impossible; beta=1e9 never
    xtr = np.concatenate([
        rng.normal(size=(50, 4)) + 3, rng.normal(size=(50, 4)) - 3,
    ]).astype(np.float32)
    s = np.asarray(cblof_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), jnp.ones(4, bool),
        n_clusters=2, alpha=1.0, beta=1e9, kmeans_iter=15, cluster_seed=0,
    ))
    assert np.isfinite(s).all()
    far = np.asarray(cblof_scores_masked(
        jnp.asarray(xtr[:1] + 40.0), jnp.asarray(xtr), jnp.ones(4, bool),
        n_clusters=2, alpha=1.0, beta=1e9, kmeans_iter=15, cluster_seed=0,
    ))
    assert far[0] > s.max()


def test_ensemble_cblof_base(rng):
    """End-to-end SubspaceEnsemble(base='cblof'): planted far outliers rank
    above inliers under every aggregation, predict() flags them, and the
    chunk governor keeps per-subspace scores exact."""
    xtr = np.concatenate([
        rng.normal(size=(60, 6)) + 3, rng.normal(size=(60, 6)) - 3,
    ]).astype(np.float32)
    xte_in = (rng.normal(size=(20, 6)) + 3).astype(np.float32)
    xte_out = xte_in[:5] + np.array([20.0, 20, 0, 20, 0, 20], np.float32)
    xte = np.concatenate([xte_in, xte_out])
    masks = rng.uniform(size=(7, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(7, 1 / 7)

    for agg in ("average", "max", "aom", "moa"):
        ens = SubspaceEnsemble(
            masks, proba, base="cblof", n_clusters=4, aggregation=agg,
            chunk=3,
        ).fit(xtr)
        s = ens.decision_function(xte)
        assert s[20:].min() > np.median(s[:20]), agg

    ens = SubspaceEnsemble(
        masks, proba, base="cblof", n_clusters=4, contamination=0.2
    ).fit(xtr)
    assert ens.predict(xte)[20:].all()

    # chunking changes vmap batch width -> different f32 matmul rounding,
    # which 30 Lloyd iterations amplify; with well-separated clusters no
    # label flips occur, so scores agree to accumulated-rounding tolerance
    # (NOT exactly, unlike the single-pass bases)
    a = SubspaceEnsemble(masks, proba, base="cblof", n_clusters=4, chunk=1,
                         normalize=None).fit(xtr)
    b = SubspaceEnsemble(masks, proba, base="cblof", n_clusters=4, chunk=64,
                         normalize=None).fit(xtr)
    np.testing.assert_allclose(
        a.per_subspace_scores(xte), b.per_subspace_scores(xte),
        rtol=1e-3, atol=1e-4,
    )


def _gmm_oracle(xte, xtr, mask, n_components, iters, seed, reg=1e-6):
    """Literal diagonal-covariance EM in f64 on the masked dims, sharing
    only the scorer's seeded init (train-row means, masked global
    variances, uniform weights); returns -log p(x)."""
    import jax
    from scipy.special import logsumexp

    m = mask.astype(np.float64)
    xt = (xtr * m).astype(np.float64)
    xq = (xte * m).astype(np.float64)
    n, d = xt.shape
    d_sub = m.sum()
    init = np.asarray(jax.random.choice(
        jax.random.PRNGKey(seed), n, (n_components,), replace=False
    ))
    mu = xt[init].copy()
    var = np.maximum(xt.var(0), reg)[None, :].repeat(n_components, 0)
    var = var * m + (1 - m)
    logw = np.full(n_components, -np.log(n_components))

    def log_prob(x, mu, var, logw):
        inv = m[None, :] / var
        quad = (x ** 2) @ inv.T - 2 * x @ (mu * inv).T + (
            (mu ** 2 * inv).sum(1)[None, :]
        )
        logdet = (m[None, :] * np.log(var)).sum(1)
        return logw[None, :] - 0.5 * (
            quad + logdet[None, :] + d_sub * np.log(2 * np.pi)
        )

    for _ in range(iters):
        lp = log_prob(xt, mu, var, logw)
        resp = np.exp(lp - logsumexp(lp, axis=1, keepdims=True))
        nc = resp.sum(0) + 1e-12
        mu = resp.T @ xt / nc[:, None]
        ex2 = resp.T @ (xt ** 2) / nc[:, None]
        var = np.maximum(ex2 - mu ** 2, 0.0) + reg
        var = var * m + (1 - m)
        logw = np.log(nc / nc.sum())
    return -logsumexp(log_prob(xq, mu, var, logw), axis=1)


def test_gmm_scores_match_numpy(rng):
    """gmm_scores_masked == the literal diagonal-EM oracle sharing only
    the seeded init (f64 oracle vs f32 device EM on well-separated
    components), and unmasked features are exactly inert."""
    from vgan_tpu.ensemble import gmm_scores_masked

    a = rng.normal(size=(80, 7)) + 4
    b = rng.normal(size=(70, 7)) - 4
    xtr = np.concatenate([a, b]).astype(np.float32)
    xte = np.concatenate([
        rng.normal(size=(12, 7)) + 4, rng.normal(size=(4, 7)) + 12,
    ]).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 1], bool)

    ours = np.asarray(gmm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_components=3, em_iter=20, component_seed=5,
    ))
    oracle = _gmm_oracle(xte, xtr, mask, 3, 20, 5)
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-3)

    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 50.0
    noisy = np.asarray(gmm_scores_masked(
        jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask),
        n_components=3, em_iter=20, component_seed=5,
    ))
    np.testing.assert_allclose(noisy, ours, rtol=1e-5)


def test_gmm_single_component_matches_diag_gaussian(rng):
    """n_components=1 collapses EM to the closed-form diagonal Gaussian:
    scores == -log N(x; mean, diag var) of the masked train moments
    (EM fixed point after one iteration, any seed)."""
    from vgan_tpu.ensemble import gmm_scores_masked

    xtr = rng.normal(size=(60, 5)).astype(np.float32) * np.array(
        [1.0, 3.0, 0.5, 2.0, 1.0], np.float32
    )
    xte = rng.normal(size=(15, 5)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 1], bool)
    ours = np.asarray(gmm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_components=1, em_iter=5, component_seed=0,
    ))
    m = mask.astype(np.float64)
    xt = (xtr * m).astype(np.float64)
    xq = (xte * m).astype(np.float64)
    mu, var = xt.mean(0), np.maximum(xt.var(0), 0) + 1e-6
    ll = -0.5 * (
        ((xq - mu) ** 2 / var * m).sum(1)
        + (m * np.log(var)).sum()
        + m.sum() * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ours, -ll, rtol=1e-4, atol=1e-4)


def test_gmm_guards():
    from vgan_tpu.ensemble import gmm_scores_masked

    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="n_components >= 1"):
        gmm_scores_masked(x, x, jnp.ones(3, bool), n_components=0)
    with pytest.raises(ValueError, match="n_components <= n_train"):
        gmm_scores_masked(x, x, jnp.ones(3, bool), n_components=5)
    with pytest.raises(ValueError, match="n_clusters >= 1"):
        SubspaceEnsemble(
            np.ones((2, 3), bool), np.full(2, 0.5), base="gmm", n_clusters=0
        )


def test_ensemble_gmm_base(rng):
    """End-to-end SubspaceEnsemble(base='gmm'): planted far outliers rank
    above inliers under every aggregation and predict() flags them."""
    xtr = np.concatenate([
        rng.normal(size=(60, 6)) + 3, rng.normal(size=(60, 6)) - 3,
    ]).astype(np.float32)
    xte_in = (rng.normal(size=(20, 6)) + 3).astype(np.float32)
    xte_out = xte_in[:5] + np.array([15.0, 15, 0, 15, 0, 15], np.float32)
    xte = np.concatenate([xte_in, xte_out])
    masks = rng.uniform(size=(7, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(7, 1 / 7)

    for agg in ("average", "max", "aom", "moa"):
        ens = SubspaceEnsemble(
            masks, proba, base="gmm", n_clusters=3, aggregation=agg, chunk=3
        ).fit(xtr)
        s = ens.decision_function(xte)
        assert s[20:].min() > np.median(s[:20]), agg

    ens = SubspaceEnsemble(
        masks, proba, base="gmm", n_clusters=3, contamination=0.2
    ).fit(xtr)
    assert ens.predict(xte)[20:].all()


def test_kmeans_plusplus_init(rng):
    """init='kmeans++' (D^2-weighted sequential seeding): deterministic per
    seed, spreads the initial centroids across well-separated clusters
    (every true cluster gets a seed — row init can miss one), and flows
    through the ensemble + vmap path."""
    import vgan_tpu.ensemble.od as od

    centers = np.array([[0, 0], [30, 0], [0, 30], [30, 30]], np.float64)
    xtr = np.concatenate([
        rng.normal(size=(40, 2)) + c for c in centers
    ]).astype(np.float32)
    xm = jnp.asarray(xtr)

    cen_a = np.asarray(od._init_centroids(xm, 4, 7, "kmeans++"))
    cen_b = np.asarray(od._init_centroids(xm, 4, 7, "kmeans++"))
    np.testing.assert_array_equal(cen_a, cen_b)

    # each seeded centroid lands in a distinct true cluster
    owner = np.linalg.norm(
        cen_a[:, None, :] - centers[None, :, :], axis=-1
    ).argmin(1)
    assert len(set(owner.tolist())) == 4, owner

    with pytest.raises(ValueError, match="cluster_init"):
        od._init_centroids(xm, 4, 7, "bogus")

    masks = np.ones((3, 2), bool)
    proba = np.full(3, 1 / 3)
    for base in ("cblof", "gmm"):
        ens = SubspaceEnsemble(
            masks, proba, base=base, n_clusters=4,
            cluster_init="kmeans++",
        ).fit(xtr)
        s = ens.decision_function(np.array([[15.0, 15.0], [0.0, 0.5]],
                                           np.float32))
        assert s[0] > s[1], base  # the between-clusters point is stranger

    with pytest.raises(ValueError, match="cluster_init"):
        SubspaceEnsemble(masks, proba, base="cblof", cluster_init="bogus")


def test_cblof_large_mask_rule():
    """_cblof_large_mask == pyod's split rule on handcrafted size vectors,
    and empty clusters are never large — even in the no-rule-fires
    fallback where every non-empty cluster becomes large."""
    import vgan_tpu.ensemble.od as od

    def oracle(sizes, n, alpha, beta):
        sizes = np.asarray(sizes, float)
        C = len(sizes)
        order = np.argsort(-sizes, kind="stable")
        ss = sizes[order]
        a = [i for i in range(1, C) if ss[:i].sum() >= alpha * n]
        b = [i for i in range(1, C) if ss[i - 1] >= beta * max(ss[i], 1e-9)]
        both = sorted(set(a) & set(b))
        thr = (both or a or b or [C])[0]
        large = np.zeros(C, bool)
        large[order[:thr]] = ss[:thr] > 0
        return large

    cases = [
        ([90, 10], 100, 0.9, 5.0),          # alpha+beta agree at i=1
        ([60, 30, 10], 100, 0.9, 5.0),      # alpha at 2, beta at 2
        ([50, 45, 5], 100, 0.9, 5.0),       # alpha at 2, beta at 2
        ([40, 40, 20], 100, 0.95, 5.0),     # beta never fires -> alpha
        ([34, 33, 33], 100, 1.0, 1e9),      # NOTHING fires -> all large
        ([60, 40, 0], 100, 1.0, 1e9),       # fallback + EMPTY cluster
        ([100, 0, 0], 100, 0.9, 5.0),       # one real cluster + empties
    ]
    rng = np.random.default_rng(0)
    for _ in range(40):                      # fuzz vs the literal rule
        C = int(rng.integers(2, 9))
        sizes = rng.integers(0, 50, C).astype(float)
        n = max(sizes.sum(), 1)
        cases.append((sizes.tolist(), n, float(rng.uniform(0.5, 1.0)),
                      float(rng.uniform(1.0, 10.0))))
    for sizes, n, alpha, beta in cases:
        got = np.asarray(od._cblof_large_mask(
            jnp.asarray(sizes, jnp.float32), n, alpha, beta
        ))
        want = oracle(sizes, n, alpha, beta)
        np.testing.assert_array_equal(got, want, err_msg=str((sizes, n,
                                                              alpha, beta)))
        assert not got[np.asarray(sizes) == 0].any()


def test_cblof_scorer_validates_alpha_beta():
    """The public scorer validates alpha/beta itself (not only the
    ensemble constructor) — swapped arguments fail loudly."""
    from vgan_tpu.ensemble import cblof_scores_masked

    x = jnp.zeros((10, 3))
    with pytest.raises(ValueError, match="alpha"):
        cblof_scores_masked(x, x, jnp.ones(3, bool), n_clusters=2,
                            alpha=1.5)
    with pytest.raises(ValueError, match="beta"):
        cblof_scores_masked(x, x, jnp.ones(3, bool), n_clusters=2,
                            beta=0.5)


def test_median_aggregation(rng):
    """aggregation='median' == np.median over the kept (proba > 0)
    per-subspace zscore rows (combo's median combination), end-to-end
    outliers rank, and the serving exporter rejects it loudly."""
    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 9.0])
    masks = rng.uniform(size=(9, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.concatenate([np.full(8, 1 / 8, np.float32), [0.0]])

    ens = SubspaceEnsemble(
        masks, proba, base="knn", k=5, aggregation="median"
    ).fit(xtr)
    s = ens.decision_function(xte)
    per = ens.per_subspace_scores(xte)          # zscore'd rows, all masks
    np.testing.assert_allclose(
        s, np.median(per[:8], axis=0), rtol=1e-6, atol=1e-7
    )
    assert s[20:].min() > np.median(s[:20])

    from vgan_tpu.serving import export_ensemble_scorer

    with pytest.raises(ValueError, match="median"):
        export_ensemble_scorer(ens, "/tmp/never_written.bin")

    with pytest.raises(ValueError, match="aggregation"):
        SubspaceEnsemble(masks, proba, base="knn", aggregation="mean")


def test_gmm_full_covariance_matches_numpy(rng):
    """covariance='full' == a literal f64 full-covariance EM oracle
    sharing only the seeded init, on CORRELATED data where the diagonal
    family is misspecified — and the full family actually separates a
    correlation-breaking outlier that diag cannot see."""
    from vgan_tpu.ensemble import gmm_scores_masked

    # tight 2-d correlation inside the masked dims
    z = rng.normal(size=(120, 1))
    xtr = np.concatenate([
        z + 0.05 * rng.normal(size=(120, 1)),
        z + 0.05 * rng.normal(size=(120, 1)),
        rng.normal(size=(120, 2)),
    ], axis=1).astype(np.float32)
    # on-manifold test points + one correlation-breaking point
    zq = rng.normal(size=(10, 1))
    xte = np.concatenate([
        np.concatenate([zq, zq, rng.normal(size=(10, 2))], axis=1),
        np.array([[1.5, -1.5, 0.0, 0.0]]),
    ]).astype(np.float32)
    mask = np.array([1, 1, 0, 1], bool)

    kw = dict(n_components=2, em_iter=15, component_seed=3)
    ours = np.asarray(gmm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        covariance="full", **kw,
    ))

    # literal f64 oracle
    import jax as _jax
    from scipy.special import logsumexp

    m = mask.astype(np.float64)
    xt = (xtr * m).astype(np.float64)
    xq = (xte * m).astype(np.float64)
    n, d = xt.shape
    d_sub = m.sum()
    reg = 1e-6
    mm = np.outer(m, m)
    fix = np.diag(m * reg + (1 - m))

    def mask_cov(c):
        return c * mm + fix

    init = np.asarray(_jax.random.choice(
        _jax.random.PRNGKey(3), n, (2,), replace=False
    ))
    mu = xt[init].copy()
    xc = xt - xt.mean(0)
    cov = np.stack([mask_cov(xc.T @ xc / (n - 1))] * 2)
    logw = np.full(2, -np.log(2.0))

    def log_prob(x, mu, cov, logw):
        out = []
        for c in range(2):
            zr = (x - mu[c]) * m
            sol = np.linalg.solve(cov[c], zr.T)
            quad = (zr * sol.T).sum(1)
            logdet = np.linalg.slogdet(cov[c])[1]
            out.append(quad + logdet)
        ql = np.stack(out, 1)
        return logw[None, :] - 0.5 * (ql + d_sub * np.log(2 * np.pi))

    for _ in range(15):
        lp = log_prob(xt, mu, cov, logw)
        resp = np.exp(lp - logsumexp(lp, axis=1, keepdims=True))
        nc = resp.sum(0) + 1e-12
        mu = resp.T @ xt / nc[:, None]
        cov = np.stack([
            mask_cov((xt - mu[c]).T @ (resp[:, c:c + 1] * (xt - mu[c]))
                     / nc[c])
            for c in range(2)
        ])
        logw = np.log(nc / nc.sum())
    oracle = -logsumexp(log_prob(xq, mu, cov, logw), axis=1)
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)

    # the correlation-breaker is the clear outlier under 'full' ...
    assert ours[-1] > ours[:-1].max() + 5.0
    # ... but diag (axis-aligned marginals both near-normal) cannot
    # separate it anywhere near as sharply
    diag = np.asarray(gmm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        covariance="diag", **kw,
    ))
    assert (ours[-1] - ours[:-1].max()) > 3.0 * (diag[-1] - diag[:-1].max())

    # unmasked dims are exactly inert
    xte_noisy = xte.copy()
    xte_noisy[:, ~mask] += 50.0
    noisy = np.asarray(gmm_scores_masked(
        jnp.asarray(xte_noisy), jnp.asarray(xtr), jnp.asarray(mask),
        covariance="full", **kw,
    ))
    np.testing.assert_allclose(noisy, ours, rtol=1e-5)


def test_gmm_covariance_validation():
    from vgan_tpu.ensemble import gmm_scores_masked

    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="covariance"):
        gmm_scores_masked(x, x, jnp.ones(3, bool), n_components=2,
                          covariance="spherical")
    with pytest.raises(ValueError, match="gmm_covariance"):
        SubspaceEnsemble(np.ones((2, 3), bool), np.full(2, 0.5),
                         base="gmm", gmm_covariance="spherical")


def test_ensemble_gmm_full_base(rng):
    """End-to-end SubspaceEnsemble(base='gmm', gmm_covariance='full'):
    planted outliers rank, and the serving export roundtrips."""
    xtr = np.concatenate([
        rng.normal(size=(60, 6)) + 3, rng.normal(size=(60, 6)) - 3,
    ]).astype(np.float32)
    xte_in = (rng.normal(size=(20, 6)) + 3).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:5] + 12.0])
    masks = rng.uniform(size=(5, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2)

    ens = SubspaceEnsemble(
        masks, proba, base="gmm", n_clusters=3, gmm_covariance="full",
    ).fit(xtr)
    s = ens.decision_function(xte)
    assert s[20:].min() > np.median(s[:20])

    from vgan_tpu.serving import export_ensemble_scorer, load_ensemble_scorer

    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "gmm_full.bin")
    export_ensemble_scorer(ens, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(s2, s, rtol=1e-5, atol=1e-6)


def test_hetero_median_combination(rng):
    """combination='median' == np.median of the standardized member rows,
    is robust to one broken (constant-noise) member, and exports in the
    single hetero StableHLO program."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble
    from vgan_tpu.ensemble.hetero import _standardize
    from vgan_tpu.serving import export_hetero_scorer, load_ensemble_scorer

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 9.0])
    masks = rng.uniform(size=(6, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6)

    het = HeterogeneousEnsemble(
        masks, proba,
        members=[{"base": "knn", "k": 5}, {"base": "ecod"},
                 {"base": "hbos"}],
        combination="median",
    ).fit(xtr)
    s = het.decision_function(xte)
    member_rows = _standardize(het.member_scores(xte))
    np.testing.assert_allclose(
        s, np.median(member_rows, axis=0), rtol=1e-6, atol=1e-7
    )
    assert s[20:].min() > np.median(s[:20])

    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "het_median.bin")
    export_hetero_scorer(het, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(s2, s, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="combination"):
        HeterogeneousEnsemble(masks, proba, combination="mean")


def test_weighted_aggregation_matches_manual(rng):
    """aggregation='weighted' (combo's weighted-average) == the explicit
    weighted mean of the per-subspace zscore rows with zero-probability
    masks dropped and the rest renormalized; exports in the StableHLO
    program; loud errors for missing/invalid weights."""
    from vgan_tpu.serving import export_ensemble_scorer, load_ensemble_scorer

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 9.0])
    masks = rng.uniform(size=(9, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.concatenate([np.full(8, 1 / 8, np.float32), [0.0]])
    weights = np.arange(1.0, 10.0, dtype=np.float32)

    ens = SubspaceEnsemble(
        masks, proba, base="knn", k=5, aggregation="weighted",
        weights=weights,
    ).fit(xtr)
    s = ens.decision_function(xte)
    per = ens.per_subspace_scores(xte)  # zscore'd rows, all masks
    w_eff = weights * (proba > 0)
    w_eff = w_eff / w_eff.sum()
    np.testing.assert_allclose(
        s, w_eff @ per, rtol=1e-5, atol=1e-6
    )

    import os
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "weighted.bin")
    export_ensemble_scorer(ens, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(s2, s, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="weighted"):
        SubspaceEnsemble(masks, proba, base="knn", aggregation="weighted")
    with pytest.raises(ValueError, match="disagree"):
        SubspaceEnsemble(masks, proba, base="knn", aggregation="weighted",
                         weights=np.ones(3))
    with pytest.raises(ValueError, match="non-negative"):
        SubspaceEnsemble(masks, proba, base="knn", aggregation="weighted",
                         weights=-weights)
    with pytest.raises(ValueError, match="positive sum"):
        # positive weight mass only on the zero-probability mask
        SubspaceEnsemble(
            masks, proba, base="knn", aggregation="weighted",
            weights=np.concatenate([np.zeros(8, np.float32), [1.0]]),
        )


def test_vote_aggregation_matches_manual(rng):
    """aggregation='vote' (combo's majority_vote): decision_function is
    the proba-weighted fraction of subspace members flagging the point at
    their own raw train-score contamination quantile; predict applies the
    strict majority; planted outliers collect (near-)unanimous votes."""
    xtr = rng.normal(size=(80, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 9.0])
    masks = rng.uniform(size=(8, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(8, 1 / 8, np.float32)

    ens = SubspaceEnsemble(
        masks, proba, base="knn", k=5, aggregation="vote",
        contamination=0.1,
    ).fit(xtr)
    frac = ens.decision_function(xte)
    assert frac.min() >= 0.0 and frac.max() <= 1.0

    s_tr = ens._raw_per_subspace(xtr, exclude_self=True)
    thr = np.quantile(s_tr, 0.9, axis=1)
    s_te = ens._raw_per_subspace(xte)
    manual = proba.astype(np.float64) @ (s_te > thr[:, None])
    np.testing.assert_allclose(frac, manual, rtol=1e-6, atol=1e-7)

    labels = ens.predict(xte)
    np.testing.assert_array_equal(labels, (frac > 0.5).astype(np.int64))
    assert ens.threshold_ == 0.5
    assert labels[20:].all(), "planted far outliers must win the vote"
    assert frac[20:].min() >= frac[:20].max() - 1e-6

    # test_chunk slicing is exact (thresholds are train-derived constants)
    ens_c = SubspaceEnsemble(
        masks, proba, base="knn", k=5, aggregation="vote",
        contamination=0.1, test_chunk=7,
    ).fit(xtr)
    np.testing.assert_allclose(ens_c.decision_function(xte), frac,
                               rtol=1e-6, atol=1e-7)

    from vgan_tpu.serving import export_ensemble_scorer

    with pytest.raises(ValueError, match="vote"):
        export_ensemble_scorer(ens, "/tmp/never_written.bin")


def test_hetero_weighted_and_vote(rng):
    """HeterogeneousEnsemble: 'weighted' == explicit weights @ standardized
    member rows (and exports); 'vote' == weighted fraction of the members'
    own predict labels with strict-majority predict; validation errors."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble
    from vgan_tpu.serving import export_hetero_scorer, load_ensemble_scorer

    xtr = rng.normal(size=(60, 6)).astype(np.float32)
    xte_in = rng.normal(size=(20, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 9.0])
    masks = rng.uniform(size=(6, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6)
    members = [{"base": "knn", "k": 5}, {"base": "ecod"}, {"base": "hbos"}]

    het = HeterogeneousEnsemble(
        masks, proba, members=members, combination="weighted",
        weights=[3.0, 1.0, 1.0],
    ).fit(xtr)
    s = het.decision_function(xte)
    rows = het.member_scores(xte).astype(np.float64)
    np.testing.assert_allclose(
        s, np.array([0.6, 0.2, 0.2]) @ rows, rtol=1e-5, atol=1e-6
    )

    import os
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "het_weighted.bin")
    export_hetero_scorer(het, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(s2, s, rtol=1e-4, atol=1e-5)

    hv = HeterogeneousEnsemble(
        masks, proba, members=members, combination="vote",
    ).fit(xtr)
    frac = hv.decision_function(xte)
    manual = np.mean(
        [m.predict(xte) for m in hv.members], axis=0
    )
    np.testing.assert_allclose(frac, manual, rtol=1e-6, atol=1e-7)
    labels = hv.predict(xte)
    np.testing.assert_array_equal(labels, (frac > 0.5).astype(np.int64))
    assert labels[20:].all(), "planted far outliers must win the vote"
    proba2 = hv.predict_proba(xte)
    assert proba2.shape == (24, 2)
    assert np.all(proba2 >= 0) and np.all(proba2 <= 1)

    with pytest.raises(ValueError, match="vote"):
        export_hetero_scorer(hv, "/tmp/never_written.bin")
    with pytest.raises(ValueError, match="weighted"):
        HeterogeneousEnsemble(masks, proba, members=members,
                              combination="weighted")
    with pytest.raises(ValueError, match="disagree"):
        HeterogeneousEnsemble(masks, proba, members=members,
                              combination="weighted", weights=[1.0])
    with pytest.raises(ValueError, match="non-negative"):
        HeterogeneousEnsemble(masks, proba, members=members,
                              combination="weighted",
                              weights=[-1.0, 1.0, 1.0])


def test_jl_member_matches_manual_projection(rng):
    """SubspaceEnsemble(jl_dim=m): fit draws the seeded Gaussian (d, m) JL
    matrix and the member works in projected space — scores equal a plain
    member fit on the explicitly projected data; predict/per_subspace/
    decision_scores_ all accept original-d inputs; validation is loud."""
    xtr = rng.normal(size=(60, 40)).astype(np.float32)
    xte_in = rng.normal(size=(20, 40)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 6.0])
    m_dim = 8
    masks = rng.uniform(size=(5, m_dim)) < 0.6
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2, np.float32)

    ens = SubspaceEnsemble(
        masks, proba, base="knn", k=5, jl_dim=m_dim, jl_seed=3,
    ).fit(xtr)
    s = ens.decision_function(xte)

    # manual: same seeded draw, plain member on pre-projected data
    r = np.random.default_rng(3).normal(
        0.0, 1.0 / np.sqrt(m_dim), size=(40, m_dim)
    ).astype(np.float32)
    xtr_p = np.asarray(jnp.asarray(xtr) @ jnp.asarray(r))
    xte_p = np.asarray(jnp.asarray(xte) @ jnp.asarray(r))
    plain = SubspaceEnsemble(masks, proba, base="knn", k=5).fit(xtr_p)
    np.testing.assert_allclose(
        s, plain.decision_function(xte_p), rtol=1e-5, atol=1e-6
    )

    # the projection preserves the planted far outliers
    assert s[20:].min() > np.median(s[:20])
    # original-d entry points all work
    assert ens.per_subspace_scores(xte).shape == (5, 24)
    assert ens.predict(xte).shape == (24,)
    assert ens.decision_scores_.shape == (60,)
    # pre-projected input passes through (shape dispatch)
    np.testing.assert_allclose(
        ens.decision_function(xte_p), s, rtol=1e-5, atol=1e-6
    )

    with pytest.raises(ValueError, match="PROJECTED space"):
        SubspaceEnsemble(np.ones((1, 40), bool), np.ones(1), base="knn",
                         jl_dim=8)
    with pytest.raises(ValueError, match="must be <"):
        SubspaceEnsemble(np.ones((1, 40), bool), np.ones(1), base="knn",
                         jl_dim=40).fit(xtr)
    with pytest.raises(ValueError, match="features"):
        ens.decision_function(xte[:, :17])


def test_jl_member_serving_export(rng):
    """A JL member's exported program takes ORIGINAL-d input and embeds
    the projection matmul in-graph."""
    import os
    import tempfile

    from vgan_tpu.serving import export_ensemble_scorer, load_ensemble_scorer

    xtr = rng.normal(size=(50, 30)).astype(np.float32)
    xte = rng.normal(size=(12, 30)).astype(np.float32)
    ens = SubspaceEnsemble(
        np.ones((1, 6), bool), np.ones(1, np.float32), base="knn", k=4,
        jl_dim=6, normalize=None,
    ).fit(xtr)
    p = os.path.join(tempfile.mkdtemp(), "jl.bin")
    export_ensemble_scorer(ens, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(
        s2, ens.decision_function(xte), rtol=1e-4, atol=1e-5
    )


def test_score_distiller_oracle(rng):
    """The RFF-ridge distiller approximates a smooth score surface: fit on
    train scores, rank-correlate > 0.95 with the true detector scores on
    HELD-OUT points near the train support (suod's approximation contract:
    the regressor replaces the detector for inference)."""
    from vgan_tpu.ensemble import ScoreDistiller

    xtr = rng.normal(size=(300, 6)).astype(np.float32)
    xte = np.concatenate([
        rng.normal(size=(60, 6)).astype(np.float32),
        rng.normal(size=(12, 6)).astype(np.float32) * 2.0,
    ])
    masks = np.ones((1, 6), bool)
    det = SubspaceEnsemble(
        masks, np.ones(1, np.float32), base="knn", k=8, normalize=None,
    ).fit(xtr)
    s_tr = det.decision_function(xtr, exclude_self=True)
    s_te = det.decision_function(xte)

    dist = ScoreDistiller(n_features=512, seed=0).fit(xtr, s_tr)
    approx = dist.predict(xte)
    from scipy.stats import spearmanr

    rho = spearmanr(approx, s_te).statistic
    assert rho > 0.95, f"distilled ranking degraded: spearman {rho:.3f}"

    with pytest.raises(ValueError, match="disagree"):
        ScoreDistiller().fit(xtr, s_tr[:10])
    with pytest.raises(ValueError, match="n_features"):
        ScoreDistiller(n_features=0)
    with pytest.raises(ValueError, match="ridge"):
        ScoreDistiller(ridge=0.0)


def test_hetero_distill_and_export(rng):
    """HeterogeneousEnsemble.distill: distilled members score through the
    regressor (ranking preserved vs the exact ensemble), votes work, the
    exported program embeds the distiller, and refit clears distillers."""
    import os
    import tempfile

    from scipy.stats import spearmanr

    from vgan_tpu.ensemble import HeterogeneousEnsemble
    from vgan_tpu.serving import export_hetero_scorer, load_ensemble_scorer

    xtr = rng.normal(size=(200, 6)).astype(np.float32)
    xte_in = rng.normal(size=(40, 6)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:8] * 2.5])
    masks = rng.uniform(size=(6, 6)) < 0.5
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6)
    members = [{"base": "knn", "k": 5}, {"base": "hbos"}]

    het = HeterogeneousEnsemble(masks, proba, members=members).fit(xtr)
    exact = het.decision_function(xte)
    het.distill(members=[0], n_features=512)
    assert het.distilled_members_ == [0]
    approx = het.decision_function(xte)
    rho = spearmanr(exact, approx).statistic
    assert rho > 0.9, f"distilled ensemble ranking degraded: {rho:.3f}"

    labels = HeterogeneousEnsemble(
        masks, proba, members=members, combination="vote",
    ).fit(xtr).distill(members=[0], n_features=256).predict(xte)
    assert labels.shape == (48,)

    p = os.path.join(tempfile.mkdtemp(), "het_distilled.bin")
    export_hetero_scorer(het, p)
    s2 = np.asarray(load_ensemble_scorer(p)(jnp.asarray(xte)))
    np.testing.assert_allclose(s2, approx, rtol=1e-3, atol=1e-4)

    het.fit(xtr)  # refit clears the approximation stage
    assert het.distilled_members_ == []


def test_hetero_jl_member_mixed_pool(rng):
    """A JL member (default full-projected pool) mixes with ordinary
    members: suod's projection stage composes with the heterogeneous
    combination, and _train_matrix stays in ORIGINAL space."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    xtr = rng.normal(size=(60, 30)).astype(np.float32)
    xte_in = rng.normal(size=(20, 30)).astype(np.float32)
    xte = np.concatenate([xte_in, xte_in[:4] + 6.0])
    masks = rng.uniform(size=(5, 30)) < 0.4
    masks[~masks.any(axis=1), 0] = True
    proba = np.full(5, 0.2)

    het = HeterogeneousEnsemble(
        masks, proba,
        members=[{"base": "knn", "k": 5},
                 {"base": "knn", "k": 5, "jl_dim": 6, "jl_seed": 1}],
    ).fit(xtr)
    assert het._train_matrix().shape == (60, 30)
    s = het.decision_function(xte)
    assert s.shape == (24,)
    assert s[20:].min() > np.median(s[:20])
    assert het.predict(xte).shape == (24,)


def test_streaming_knn_merge_large_k_scan_path(rng, monkeypatch):
    """k in (_KPASS_UNROLL_MAX, _KPASS_MAX_K]: the lax.scan k-pass merge
    (round-4 extension past the old k<=32 unroll cap) is exact vs the
    dense sort, ties broken by smallest index, exclude_self honored."""
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(300, 6)).astype(np.float32)
    # duplicate rows force value ties across blocks
    xtr[150:180] = xtr[:30]
    xte = np.concatenate([xtr[:20], rng.normal(size=(15, 6)).astype(np.float32)])
    mask = jnp.asarray(np.array([1, 1, 0, 1, 1, 0], bool))
    k = 64
    assert od._KPASS_UNROLL_MAX < k <= od._KPASS_MAX_K

    monkeypatch.setattr(od, "STREAM_NTR", 50)
    monkeypatch.setattr(od, "_MERGE_BLOCK", 64)
    for excl in (False, True):
        vals, idx = od._masked_knn_streaming(
            jnp.asarray(xte), jnp.asarray(xtr), mask, k, excl
        )
        d2 = od._masked_sq_dists(jnp.asarray(xte), jnp.asarray(xtr), mask)
        if excl:
            d2 = od._mask_diagonal(d2)
        dense = np.sort(np.asarray(d2), axis=1)[:, :k]
        np.testing.assert_allclose(
            np.asarray(vals), dense, rtol=1e-6, atol=1e-6,
            err_msg=f"exclude_self={excl}",
        )
        # indices must be a valid realization (value at idx == val) and
        # strictly lexicographically increasing per row
        gathered = np.take_along_axis(
            np.asarray(d2), np.asarray(idx), axis=1
        )
        np.testing.assert_allclose(gathered, np.asarray(vals),
                                   rtol=1e-6, atol=1e-6)
        pairs = np.stack([np.asarray(vals), np.asarray(idx)], axis=-1)
        assert np.all(
            (pairs[:, 1:, 0] > pairs[:, :-1, 0])
            | ((pairs[:, 1:, 0] == pairs[:, :-1, 0])
               & (pairs[:, 1:, 1] > pairs[:, :-1, 1]))
        ), "merge order must be lexicographic (value, index)"


def test_streaming_knn_merge_above_cap_warns(rng, monkeypatch):
    """k > _KPASS_MAX_K falls back to the per-block sort — still exact,
    but loudly flagged as the slow regime."""
    import vgan_tpu.ensemble.od as od

    xtr = rng.normal(size=(400, 5)).astype(np.float32)
    xte = rng.normal(size=(10, 5)).astype(np.float32)
    mask = jnp.ones(5, bool)
    k = od._KPASS_MAX_K + 8

    monkeypatch.setattr(od, "STREAM_NTR", 50)
    monkeypatch.setattr(od, "_MERGE_BLOCK", 256)
    with pytest.warns(RuntimeWarning, match="slower than the k-pass"):
        vals, _ = od._masked_knn_streaming(
            jnp.asarray(xte), jnp.asarray(xtr), mask, k, False
        )
    d2 = np.sort(
        np.asarray(od._masked_sq_dists(jnp.asarray(xte), jnp.asarray(xtr),
                                       mask)), axis=1
    )[:, :k]
    np.testing.assert_allclose(np.asarray(vals), d2, rtol=1e-6, atol=1e-6)


def test_ocsvm_scores_match_numpy_oracle(rng):
    """ocsvm_scores_masked vs a direct f64 numpy transcription of the
    SAME fixed-protocol solver (power iteration -> projected FISTA ->
    margin-SV rho) on the projected columns — pins the JAX program
    against an independent implementation of the identical math (oracle
    tier; the libsvm cross-library pin lives in test_sklearn_parity)."""
    from vgan_tpu.ensemble import ocsvm_scores_masked

    ntr, nt, d, nu = 80, 25, 7, 0.4
    xtr = rng.normal(size=(ntr, d)).astype(np.float64)
    xte = rng.normal(size=(nt, d)).astype(np.float64)
    mask = np.array([1, 0, 1, 1, 0, 1, 1], bool)

    # --- numpy f64 oracle on the projected columns -----------------------
    xs, zs = xtr[:, mask], xte[:, mask]
    g = 1.0 / mask.sum()
    d2 = ((xs[:, None] - xs[None]) ** 2).sum(-1)
    k_tr = np.exp(-g * d2)
    k_te = np.exp(-g * ((zs[:, None] - xs[None]) ** 2).sum(-1))
    C = 1.0 / (nu * ntr)
    b = np.ones(ntr) / np.sqrt(ntr)
    for _ in range(30):
        b = k_tr @ b
        b /= np.linalg.norm(b) + np.finfo(np.float64).tiny
    step = 1.0 / ((b @ (k_tr @ b)) * 1.02 + np.finfo(np.float64).tiny)

    def project(v):
        lo, hi = v.min() - C, v.max()
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if np.clip(v - mid, 0.0, C).sum() > 1.0:
                lo = mid
            else:
                hi = mid
        return np.clip(v - 0.5 * (lo + hi), 0.0, C)

    a = np.full(ntr, 1.0 / ntr)
    y, t = a.copy(), 1.0
    for _ in range(300):
        a_new = project(y - step * (k_tr @ y))
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
        y = a_new + ((t - 1.0) / t_new) * (a_new - a)
        a, t = a_new, t_new
    f_tr = k_tr @ a
    margin = (a > C * 1e-3) & (a < C - C * 1e-3)
    rho = f_tr[margin].mean() if margin.any() else f_tr[a > C * 1e-3].mean()
    want = (rho - k_te @ a) * (nu * ntr)

    # x64 is on in tests: f64 in -> f64 compute, so the pin is tight
    ours = np.asarray(ocsvm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), nu=nu,
    ))
    np.testing.assert_allclose(ours, want, rtol=1e-9, atol=1e-12)


def test_ocsvm_separation_determinism_validation(rng):
    """Planted outliers score higher; repeated calls bit-identical;
    loud errors on bad nu / too-few rows; ensemble + hetero composition."""
    from vgan_tpu.ensemble import (
        HeterogeneousEnsemble,
        SubspaceEnsemble,
        ocsvm_scores_masked,
    )

    d = 9
    xtr = rng.normal(size=(120, d)).astype(np.float32)
    inl = rng.normal(size=(25, d)).astype(np.float32)
    out = (rng.normal(size=(8, d)) * 3.0 + 3.5).astype(np.float32)
    xte = np.vstack([inl, out])
    mask = np.ones(d, bool)
    mask[4] = False

    s = np.asarray(ocsvm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)))
    assert np.all(np.isfinite(s))
    assert s[25:].mean() > s[:25].mean()

    a = np.asarray(ocsvm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), iters=50))
    b = np.asarray(ocsvm_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), iters=50))
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="nu must be in"):
        ocsvm_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), nu=0.0)
    with pytest.raises(ValueError, match="at least 2 train rows"):
        ocsvm_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr[:1]), jnp.asarray(mask))
    with pytest.raises(ValueError, match="ocsvm_nu must be in"):
        SubspaceEnsemble(np.ones((1, d), bool), np.ones(1), base="ocsvm",
                         ocsvm_nu=1.5)
    with pytest.raises(ValueError, match="ocsvm_iters must be"):
        SubspaceEnsemble(np.ones((1, d), bool), np.ones(1), base="ocsvm",
                         ocsvm_iters=0)

    subs = rng.uniform(size=(6, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)
    ens = SubspaceEnsemble(
        subs, proba, base="ocsvm", ocsvm_nu=0.3, ocsvm_iters=150, chunk=3,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[25:].mean() > scores[:25].mean()
    assert ens.predict(xte).shape == (33,)

    het = HeterogeneousEnsemble(
        subs, proba,
        members=[{"base": "ocsvm", "ocsvm_iters": 100}, {"base": "knn"}],
        combination="average", k=5,
    ).fit(xtr)
    hs = het.decision_function(xte)
    assert hs[25:].mean() > hs[:25].mean()


def test_ocsvm_effective_chunk_governor():
    from vgan_tpu.ensemble.od import _MAHA_CHUNK_BUDGET, _effective_chunk

    nt, ntr, d = 50, 2000, 64
    per_mask = 2 * ntr * ntr + nt * ntr + ntr * d
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // per_mask))
    assert _effective_chunk("ocsvm", 128, nt, ntr, d) == expect
    assert _effective_chunk("ocsvm", 128, 20, 100, 8) == 128


def _sos_oracle(x, mask, perplexity=4.5, iters=64):
    """numpy-f64 transcription of the published SOS chain (Janssens et
    al. 2012 / scikit-sos): squared-distance affinities, perplexity
    bisection with the same fixed iteration rule as the JAX program,
    binding probabilities, transductive outlier probability."""
    xs = np.asarray(x, np.float64)[:, mask]
    n = len(xs)
    d2 = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    beta = np.ones(n)
    lo, hi = np.zeros(n), np.full(n, np.inf)
    log_u = np.log(perplexity)
    for _ in range(iters):
        a = np.exp(-d2 * beta[:, None])
        np.fill_diagonal(a, 0.0)
        sum_a = np.maximum(a.sum(1), np.finfo(np.float64).tiny)
        h = np.log(sum_a) + beta * np.sum(d2 * a, 1) / sum_a
        too_spread = h > log_u
        lo = np.where(too_spread, beta, lo)
        hi = np.where(too_spread, hi, beta)
        beta = np.where(
            too_spread,
            np.where(np.isinf(hi), beta * 2.0, 0.5 * (lo + hi)),
            np.where(lo == 0.0, beta * 0.5, 0.5 * (lo + hi)),
        )
    a = np.exp(-d2 * beta[:, None])
    np.fill_diagonal(a, 0.0)
    b = a / a.sum(1)[:, None]
    return np.prod(1.0 - b, axis=0)


def test_sos_transductive_matches_numpy_oracle(rng):
    """sos_scores_masked(exclude_self=True) on self-aligned rows vs the
    f64 oracle of the published recipe on the projected columns — the
    shifted-kernel bisection and log-space binding must be numerically
    equivalent to the plain-exp chain (x64 is on in tests, so the pin is
    tight). Two perplexities, subspace + full masks."""
    from vgan_tpu.ensemble import sos_scores_masked

    d = 7
    x = rng.normal(size=(60, d)).astype(np.float64)
    x[:4] += 3.0  # planted cluster so betas spread
    for mask in (np.array([1, 0, 1, 0, 0, 1, 1], bool), np.ones(d, bool)):
        for perp in (4.5, 10.0):
            ours = np.asarray(sos_scores_masked(
                jnp.asarray(x), jnp.asarray(x), jnp.asarray(mask),
                perplexity=perp, exclude_self=True,
            ))
            want = _sos_oracle(x, mask, perplexity=perp)
            np.testing.assert_allclose(ours, want, rtol=1e-7, atol=1e-10)


def test_sos_novelty_separation_determinism_validation(rng):
    """Novelty scores are per-point probabilities in [0, 1] with planted
    outliers on top; repeated calls bit-identical; loud guards; ensemble
    + hetero + predict composition."""
    from vgan_tpu.ensemble import (
        HeterogeneousEnsemble,
        SubspaceEnsemble,
        sos_scores_masked,
    )

    d = 9
    xtr = rng.normal(size=(90, d)).astype(np.float32)
    inl = rng.normal(size=(25, d)).astype(np.float32)
    out = (rng.normal(size=(8, d)) * 2.0 + 4.0).astype(np.float32)
    xte = np.vstack([inl, out])
    mask = np.ones(d, bool)
    mask[4] = False

    s = np.asarray(sos_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)))
    assert np.all(np.isfinite(s)) and np.all(s >= 0.0) and np.all(s <= 1.0)
    assert s[25:].mean() > s[:25].mean()

    a = np.asarray(sos_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask)))
    np.testing.assert_array_equal(a, s)

    with pytest.raises(ValueError, match="at least 2 train rows"):
        sos_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr[:1]), jnp.asarray(mask))
    with pytest.raises(ValueError, match="perplexity < n_train"):
        sos_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr[:4]), jnp.asarray(mask),
            perplexity=10.0)
    with pytest.raises(ValueError, match="sos_perplexity must be"):
        SubspaceEnsemble(np.ones((1, d), bool), np.ones(1), base="sos",
                         sos_perplexity=0.0)
    with pytest.raises(ValueError, match="sos_iters must be"):
        SubspaceEnsemble(np.ones((1, d), bool), np.ones(1), base="sos",
                         sos_iters=0)

    subs = rng.uniform(size=(6, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)
    ens = SubspaceEnsemble(
        subs, proba, base="sos", sos_perplexity=6.0, chunk=3,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[25:].mean() > scores[:25].mean()
    # decision_scores_ goes through the positional-excl path (no k guard)
    assert ens.decision_scores_.shape == (90,)
    assert ens.predict(xte).shape == (33,)

    het = HeterogeneousEnsemble(
        subs, proba,
        members=[{"base": "sos", "sos_perplexity": 6.0}, {"base": "knn"}],
        combination="average", k=5,
    ).fit(xtr)
    hs = het.decision_function(xte)
    assert hs[25:].mean() > hs[:25].mean()


def test_sos_exclude_self_concat_consistency(rng):
    """In predict's concatenated [train; test] batch the leading rows
    score transductively and the trailing novel rows through the
    novelty denominator — identical to calling the two paths
    separately."""
    from vgan_tpu.ensemble import sos_scores_masked

    d = 6
    xtr = rng.normal(size=(40, d)).astype(np.float32)
    xte = rng.normal(size=(11, d)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    both = np.vstack([xtr, xte])
    s_both = np.asarray(sos_scores_masked(
        jnp.asarray(both), jnp.asarray(xtr), jnp.asarray(mask),
        exclude_self=True,
    ))
    s_tr = np.asarray(sos_scores_masked(
        jnp.asarray(xtr), jnp.asarray(xtr), jnp.asarray(mask),
        exclude_self=True,
    ))
    s_te = np.asarray(sos_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
    ))
    np.testing.assert_allclose(s_both[:40], s_tr, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s_both[40:], s_te, rtol=1e-6, atol=1e-9)


def test_sos_effective_chunk_governor():
    from vgan_tpu.ensemble.od import _MAHA_CHUNK_BUDGET, _effective_chunk

    nt, ntr, d = 50, 2000, 64
    per_mask = 4 * ntr * ntr + 3 * ntr * nt
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // per_mask))
    assert _effective_chunk("sos", 128, nt, ntr, d) == expect
    assert _effective_chunk("sos", 128, 20, 100, 8) == 128


def test_lmdd_scores_match_numpy_oracle(rng):
    """lmdd_scores_masked vs an f64 numpy transcription of the Arning
    singleton smoothing factors on the projected columns — both the
    leave-one-out (exclude_self, incl. predict's concat batch with
    trailing novel rows) and add-one paths, both dissimilarities."""
    from vgan_tpu.ensemble import lmdd_scores_masked

    d = 8
    x = rng.normal(size=(50, d)).astype(np.float64)
    x[:2] *= 4.0  # planted deviations
    xt = rng.normal(size=(15, d)).astype(np.float64)
    xt[:2] += 6.0
    mask = np.zeros(d, bool)
    mask[[0, 2, 3, 6]] = True

    def oracle(x_test, dis, excl):
        xtr = x[:, mask]
        xq = np.asarray(x_test, np.float64)[:, mask]
        n = len(xtr)

        def dval(a):
            if dis == "var":
                return np.mean(np.var(a, axis=0))
            return np.mean(np.abs(a - a.mean(0)))

        d_full = dval(xtr)
        out = []
        for t, row in enumerate(xq):
            if excl and t < n:
                rest = np.delete(xtr, t, axis=0)
                out.append(max(d_full - dval(rest), 0.0) * (n - 1))
            else:
                out.append(
                    max(dval(np.vstack([xtr, row])) - d_full, 0.0) * n
                )
        return np.array(out)

    for dis in ("var", "aad"):
        for excl, q in ((True, np.vstack([x, xt])), (False, xt)):
            ours = np.asarray(lmdd_scores_masked(
                jnp.asarray(q), jnp.asarray(x), jnp.asarray(mask),
                dis_measure=dis, exclude_self=excl,
            ))
            want = oracle(q, dis, excl)
            np.testing.assert_allclose(ours, want, rtol=1e-9, atol=1e-12)


def test_lmdd_separation_validation_composition(rng):
    """Planted deviations dominate; loud guards; ensemble / hetero /
    predict / decision_scores_ composition for both measures."""
    from vgan_tpu.ensemble import (
        HeterogeneousEnsemble,
        SubspaceEnsemble,
        lmdd_scores_masked,
    )

    d = 9
    xtr = rng.normal(size=(80, d)).astype(np.float32)
    inl = rng.normal(size=(25, d)).astype(np.float32)
    out = (rng.normal(size=(8, d)) * 3.0 + 4.0).astype(np.float32)
    xte = np.vstack([inl, out])
    mask = np.ones(d, bool)

    for dis in ("var", "aad"):
        s = np.asarray(lmdd_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
            dis_measure=dis,
        ))
        assert np.all(np.isfinite(s)) and np.all(s >= 0.0)
        assert s[25:].mean() > s[:25].mean()

    with pytest.raises(ValueError, match="dis_measure"):
        lmdd_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
            dis_measure="iqr")
    with pytest.raises(ValueError, match="at least 2 train rows"):
        lmdd_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr[:1]), jnp.asarray(mask))
    with pytest.raises(ValueError, match="lmdd_dis"):
        SubspaceEnsemble(np.ones((1, d), bool), np.ones(1), base="lmdd",
                         lmdd_dis="iqr")

    subs = rng.uniform(size=(6, d)) < 0.5
    subs[~subs.any(axis=1), 0] = True
    proba = np.full(6, 1 / 6, np.float32)
    ens = SubspaceEnsemble(
        subs, proba, base="lmdd", lmdd_dis="aad", chunk=3,
    ).fit(xtr)
    scores = ens.decision_function(xte)
    assert scores[25:].mean() > scores[:25].mean()
    assert ens.decision_scores_.shape == (80,)
    assert ens.predict(xte).shape == (33,)

    het = HeterogeneousEnsemble(
        subs, proba,
        members=[{"base": "lmdd"}, {"base": "knn"}],
        combination="average", k=5,
    ).fit(xtr)
    hs = het.decision_function(xte)
    assert hs[25:].mean() > hs[:25].mean()


def test_lmdd_effective_chunk_governor():
    from vgan_tpu.ensemble.od import (
        _LMDD_BLOCK, _MAHA_CHUNK_BUDGET, _effective_chunk,
    )

    nt, ntr, d = 400, 2000, 64
    per_mask = ntr * d + 3 * nt * d + _LMDD_BLOCK * nt * d
    expect = max(1, min(128, _MAHA_CHUNK_BUDGET // per_mask))
    assert _effective_chunk("lmdd", 128, nt, ntr, d) == expect
    assert _effective_chunk("lmdd", 128, 20, 100, 4) == 128


def _np_adam(params, grad_fn, epochs, lr):
    """f64 numpy transcription of od._adam_train (bias-corrected Adam,
    eps 1e-8 OUTSIDE the sqrt, step-size folding)."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    for t in range(epochs):
        g = grad_fn(params)
        tf = float(t) + 1.0
        sz = lr * np.sqrt(1.0 - b2 ** tf) / (1.0 - b1 ** tf)
        for i in range(len(params)):
            m[i] = b1 * m[i] + (1 - b1) * g[i]
            v[i] = b2 * v[i] + (1 - b2) * g[i] * g[i]
            params[i] = params[i] - sz * m[i] / (np.sqrt(v[i]) + eps)
    return params


def test_ae_scores_match_numpy_oracle(rng):
    """ae_scores_masked vs a full f64 numpy transcription of the SAME
    fixed protocol — Glorot-uniform init from the same host RNG,
    identical full-batch Adam (epochs/lr/eps), masked-output MSE
    normalized by the active dim count, Euclidean reconstruction
    distance — with hand-written backprop (round-4 VERDICT item 4:
    the deep bases move from structural to oracle-tier verification)."""
    from vgan_tpu.ensemble import ae_scores_masked

    ntr, nt, d, hidden, epochs, lr, seed = 50, 12, 6, (8, 4), 40, 1e-3, 3
    xtr = rng.normal(size=(ntr, d)).astype(np.float64)
    xte = rng.normal(size=(nt, d)).astype(np.float64)
    mask = np.array([1, 0, 1, 1, 0, 1], bool)
    mask_f = mask.astype(np.float64)

    # --- oracle -----------------------------------------------------------
    xm = xtr * mask_f
    mu = xm.mean(0)
    scale = np.sqrt(((xm - mu) ** 2).mean(0))
    scale = np.where(scale > 0.0, scale, 1.0)
    z_tr = (xm - mu) / scale
    z_te = (xte * mask_f - mu) / scale
    d_sub = max(mask_f.sum(), 1.0)

    widths = [d, *hidden, *list(reversed(hidden))[1:], d]
    host = np.random.default_rng(seed)
    Ws, bs = [], []
    for w_in, w_out in zip(widths[:-1], widths[1:]):
        lim = float(np.sqrt(6.0 / (w_in + w_out)))
        Ws.append(host.uniform(-lim, lim, (w_in, w_out)))
        bs.append(np.zeros(w_out))

    def fwd(params, z):
        Ws = params[: len(widths) - 1]
        bs = params[len(widths) - 1:]
        acts, pres = [z], []
        a = z
        for i, (w, b) in enumerate(zip(Ws, bs)):
            pre = a @ w + b
            pres.append(pre)
            a = np.maximum(pre, 0.0) if i < len(Ws) - 1 else pre
            acts.append(a)
        return acts, pres, a * mask_f

    def grad(params):
        Ws = params[: len(widths) - 1]
        acts, pres, out = fwd(params, z_tr)
        c = 1.0 / (ntr * d_sub)
        delta = 2.0 * c * (out - z_tr) * mask_f  # d/d a_last
        gW, gb = [None] * len(Ws), [None] * len(Ws)
        for i in reversed(range(len(Ws))):
            if i < len(Ws) - 1:
                delta = delta * (pres[i] > 0.0)
            gW[i] = acts[i].T @ delta
            gb[i] = delta.sum(0)
            delta = delta @ Ws[i].T
        return gW + gb

    params = _np_adam(Ws + bs, grad, epochs, lr)
    _, _, r_te = fwd(params, z_te)
    want = np.sqrt(((r_te - z_te) ** 2).sum(1))

    ours = np.asarray(ae_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=hidden, epochs=epochs, lr=lr, seed=seed,
    ))
    np.testing.assert_allclose(ours, want, rtol=1e-8, atol=1e-10)


def test_dsvdd_scores_match_numpy_oracle(rng):
    """dsvdd_scores_masked vs a full f64 numpy transcription (bias-free
    encoder, eps-snapped mean-init center, squared-distance + weight-
    decay loss, same Adam) with hand-written backprop."""
    from vgan_tpu.ensemble import dsvdd_scores_masked

    ntr, nt, d, hidden, epochs, lr, wd, seed = 50, 12, 6, (8, 4), 40, 1e-3, 1e-5, 2
    xtr = rng.normal(size=(ntr, d)).astype(np.float64)
    xte = rng.normal(size=(nt, d)).astype(np.float64)
    mask = np.array([1, 1, 0, 1, 1, 0], bool)
    mask_f = mask.astype(np.float64)

    xm = xtr * mask_f
    mu = xm.mean(0)
    scale = np.sqrt(((xm - mu) ** 2).mean(0))
    scale = np.where(scale > 0.0, scale, 1.0)
    z_tr = (xm - mu) / scale
    z_te = (xte * mask_f - mu) / scale

    widths = [d, *hidden]
    host = np.random.default_rng(seed)
    Ws = []
    for w_in, w_out in zip(widths[:-1], widths[1:]):
        lim = float(np.sqrt(6.0 / (w_in + w_out)))
        Ws.append(host.uniform(-lim, lim, (w_in, w_out)))

    def embed(Ws, z):
        acts, pres = [z], []
        a = z
        for i, w in enumerate(Ws):
            pre = a @ w
            pres.append(pre)
            a = np.maximum(pre, 0.0) if i < len(Ws) - 1 else pre
            acts.append(a)
        return acts, pres, a

    _, _, e0 = embed(Ws, z_tr)
    c0 = e0.mean(0)
    eps_c = 0.1
    c = np.where(np.abs(c0) < eps_c, np.where(c0 < 0, -eps_c, eps_c), c0)

    def grad(Ws):
        acts, pres, e = embed(Ws, z_tr)
        delta = 2.0 * (e - c) / ntr
        g = [None] * len(Ws)
        for i in reversed(range(len(Ws))):
            if i < len(Ws) - 1:
                delta = delta * (pres[i] > 0.0)
            g[i] = acts[i].T @ delta + 2.0 * wd * Ws[i]
            delta = delta @ Ws[i].T
        return g

    Ws = _np_adam(Ws, grad, epochs, lr)
    _, _, e_te = embed(Ws, z_te)
    want = ((e_te - c) ** 2).sum(1)

    ours = np.asarray(dsvdd_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        hidden=hidden, epochs=epochs, lr=lr, weight_decay=wd, seed=seed,
    ))
    np.testing.assert_allclose(ours, want, rtol=1e-8, atol=1e-10)
