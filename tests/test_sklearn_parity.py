"""Cross-library parity: masked scorers vs real scikit-learn on the
projected column subset.

The f64 numpy oracles in test_ensemble.py pin OUR transcription of each
base-detector recipe; these tests pin the recipes themselves against the
library the reference's pyod pin computes with (sklearn is pyod's backend
for KNN/LOF/KDE/PCA/KernelPCA — /root/reference/requirements.txt:58).
Masked scorers on full-d data with mask m must equal sklearn run on the
actual column subset ``x[:, m]`` — the defining contract of the subspace
ensemble (each member behaves as a pyod detector fitted on the projected
data).
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

import jax.numpy as jnp  # noqa: E402


@pytest.fixture()
def data():
    rng = np.random.default_rng(42)
    xtr = rng.normal(size=(60, 9)).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(20, 9)),
        rng.normal(size=(5, 9)) * 2.5 + 3.0,  # a few genuine outliers
    ]).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
    return xtr, xte, mask


def test_knn_matches_sklearn(data):
    from sklearn.neighbors import NearestNeighbors

    from vgan_tpu.ensemble import knn_scores_masked, mean_dist_scores_masked

    xtr, xte, mask = data
    k = 7
    nn = NearestNeighbors(n_neighbors=k).fit(xtr[:, mask].astype(np.float64))
    dist, _ = nn.kneighbors(xte[:, mask].astype(np.float64))

    ours_kth = np.asarray(knn_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k
    ))
    np.testing.assert_allclose(ours_kth, dist[:, -1], rtol=1e-4, atol=1e-5)

    ours_mean = np.asarray(mean_dist_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k
    ))
    np.testing.assert_allclose(
        ours_mean, dist.mean(axis=1), rtol=1e-4, atol=1e-5
    )


def test_lof_matches_sklearn(data):
    """lof_scores_masked == the LOF ratio sklearn's novelty-mode
    score_samples negates (pyod LOF wraps exactly this estimator)."""
    from sklearn.neighbors import LocalOutlierFactor

    from vgan_tpu.ensemble import lof_scores_masked

    xtr, xte, mask = data
    k = 6
    clf = LocalOutlierFactor(n_neighbors=k, novelty=True).fit(
        xtr[:, mask].astype(np.float64)
    )
    want = -clf.score_samples(xte[:, mask].astype(np.float64))
    ours = np.asarray(lof_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), k
    ))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=1e-5)


def test_kde_matches_sklearn(data):
    """kde_scores_masked == -KernelDensity.score_samples on the column
    subset (the docstring's exact-equality claim, now pinned against the
    real library instead of a transcription)."""
    from sklearn.neighbors import KernelDensity

    from vgan_tpu.ensemble import kde_scores_masked

    xtr, xte, mask = data
    for h in (0.7, 1.3):
        kd = KernelDensity(bandwidth=h).fit(xtr[:, mask].astype(np.float64))
        want = -kd.score_samples(xte[:, mask].astype(np.float64))
        ours = np.asarray(kde_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
            bandwidth=h,
        ))
        np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_pca_matches_sklearn_pipeline(data):
    """pca_scores_masked == pyod's PCA score rebuilt from real sklearn
    StandardScaler + PCA objects (components as points, cdist summed,
    inverse explained-variance weights) — pins our eigh path against
    sklearn's SVD, svd_flip signs included (signs move the per-component
    distances, so a flip mismatch would not cancel)."""
    from scipy.spatial.distance import cdist
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    from vgan_tpu.ensemble import pca_scores_masked

    xtr, xte, mask = data
    xs = xtr[:, mask].astype(np.float64)
    zs = xte[:, mask].astype(np.float64)
    scaler = StandardScaler().fit(xs)
    z_tr, z_te = scaler.transform(xs), scaler.transform(zs)
    p = PCA().fit(z_tr)
    for n_sel in (0, 3):
        comp = p.components_
        ratio = p.explained_variance_ratio_
        if n_sel:
            comp, ratio = comp[-n_sel:], ratio[-n_sel:]
        want = (cdist(z_te, comp) / ratio).sum(axis=1)
        ours = np.asarray(pca_scores_masked(
            jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
            n_selected=n_sel,
        ))
        np.testing.assert_allclose(ours, want, rtol=2e-3)


def test_mcd_matches_sklearn():
    """mcd_scores_masked == MinCovDet.mahalanobis on data whose MCD
    optimum is unambiguous (tight inlier cluster + far outliers), so our
    fixed-protocol FastMCD and sklearn's tournament converge to the SAME
    h-support — pinning the h formula, the analytic Pison/Croux raw
    consistency factor, the 0.975 reweighting, and the reweighted-score
    scaling exactly."""
    from sklearn.covariance import MinCovDet

    from vgan_tpu.ensemble import mcd_scores_masked

    rng = np.random.default_rng(7)
    n_in, n_out, d = 100, 15, 7
    xtr = np.vstack([
        rng.normal(size=(n_in, d)) * 0.5,
        rng.normal(size=(n_out, d)) * 6 + 12,
    ]).astype(np.float32)
    xte = np.vstack([
        rng.normal(size=(12, d)) * 0.5,
        rng.normal(size=(4, d)) * 6 + 12,
    ]).astype(np.float32)
    mask = np.ones(d, bool)
    mask[2] = False
    m = MinCovDet(random_state=0).fit(xtr[:, mask].astype(np.float64))
    want = m.mahalanobis(xte[:, mask].astype(np.float64))
    ours = np.asarray(mcd_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask), seed=1
    ))
    np.testing.assert_allclose(ours, want, rtol=5e-3)


def test_kpca_matches_sklearn_pipeline(data):
    """kpca_scores_masked == Hoffmann's score rebuilt from a real sklearn
    KernelPCA (transform already applies the centering + 1/sqrt(lambda)
    scaling) plus the spherical-potential terms from rbf_kernel."""
    from sklearn.decomposition import KernelPCA
    from sklearn.metrics.pairwise import rbf_kernel

    from vgan_tpu.ensemble import kpca_scores_masked

    xtr, xte, mask = data
    xs = xtr[:, mask].astype(np.float64)
    zs = xte[:, mask].astype(np.float64)
    g = 1.0 / mask.sum()  # sklearn's default on the projected data
    m = 10
    kp = KernelPCA(n_components=m, kernel="rbf", gamma=g).fit(xs)
    t_te = kp.transform(zs)  # (nt, m): projections / sqrt(lambda)
    k_te = rbf_kernel(zs, xs, gamma=g)
    k_tr = rbf_kernel(xs, xs, gamma=g)
    potential = 1.0 - 2.0 * k_te.mean(axis=1) + k_tr.mean()
    want = potential - (t_te ** 2).sum(axis=1)
    ours = np.asarray(kpca_scores_masked(
        jnp.asarray(xte), jnp.asarray(xtr), jnp.asarray(mask),
        n_components=m,
    ))
    np.testing.assert_allclose(ours, want, rtol=5e-3, atol=1e-5)


def test_ocsvm_matches_sklearn(data):
    """ocsvm_scores_masked == the NEGATED decision_function of sklearn
    OneClassSVM (libsvm) on the column subset, up to libsvm's alpha
    scaling (ours solves the unit-simplex dual; libsvm's alphas sum to
    nu*n — the score already multiplies by nu*n so VALUES match, not
    just ranks). Tolerance: the fixed 300-iteration FISTA reproduces
    libsvm's interior-point-quality solution to ~2e-4 of the decision
    range (measured across n in [60,400], nu in [0.1,0.9] — see the
    scorer docstring); pinned here at 1e-3 of the range plus exact
    rank agreement (Spearman == 1 to 6 decimals)."""
    from scipy.stats import spearmanr
    from sklearn.svm import OneClassSVM

    from vgan_tpu.ensemble import ocsvm_scores_masked

    xtr, xte, mask = data
    for nu in (0.5, 0.2):
        g = 1.0 / mask.sum()  # 'auto' on the projected columns
        clf = OneClassSVM(kernel="rbf", nu=nu, gamma=g).fit(
            xtr[:, mask].astype(np.float64)
        )
        want = -clf.decision_function(xte[:, mask].astype(np.float64))
        ours = np.asarray(ocsvm_scores_masked(
            jnp.asarray(xte.astype(np.float64)),
            jnp.asarray(xtr.astype(np.float64)),
            jnp.asarray(mask), nu=nu,
        ))
        scale = np.abs(want).max()
        np.testing.assert_allclose(ours, want, atol=1e-3 * scale)
        assert spearmanr(ours, want).statistic > 0.999999
