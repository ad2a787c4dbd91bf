"""Two-sample MMD permutation test: statistic correctness vs a naive numpy
oracle, and statistical sanity of the p-values (calibration under H0, power
under a clear mean shift)."""

import jax
import numpy as np

from vgan_tpu.ops.mmd_test import mmd_permutation_test


def naive_unbiased_mmd(x, y, alphas):
    z = np.concatenate([x, y], axis=0)
    d2 = ((z[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    k = sum(np.exp(-a * d2) for a in alphas)
    n1, n2 = len(x), len(y)
    kxx = k[:n1, :n1]
    kyy = k[n1:, n1:]
    kxy = k[:n1, n1:]
    s_xx = kxx.sum() - np.trace(kxx)
    s_yy = kyy.sum() - np.trace(kyy)
    return (
        s_xx / (n1 * (n1 - 1))
        + s_yy / (n2 * (n2 - 1))
        - 2.0 * kxy.sum() / (n1 * n2)
    )


def test_statistic_matches_naive(rng):
    x = rng.normal(size=(20, 3))
    y = rng.normal(size=(25, 3)) + 0.4
    for alphas in ([0.5], [0.1, 1.0, 5.0]):
        stat, _ = mmd_permutation_test(
            x, y, alphas=alphas, key=jax.random.PRNGKey(0), n_permutations=10
        )
        np.testing.assert_allclose(
            float(stat), naive_unbiased_mmd(x, y, alphas), rtol=1e-6
        )


def test_pvalue_calibrated_under_h0(rng):
    # same distribution -> p-value should not be extreme
    x = rng.normal(size=(60, 4))
    y = rng.normal(size=(60, 4))
    _, pval = mmd_permutation_test(
        x, y, alphas=[0.5], key=jax.random.PRNGKey(1), n_permutations=500
    )
    assert 0.02 < float(pval) <= 1.0


def test_pvalue_power_under_shift(rng):
    # strong mean shift -> tiny p-value
    x = rng.normal(size=(60, 4))
    y = rng.normal(size=(60, 4)) + 2.0
    _, pval = mmd_permutation_test(
        x, y, alphas=[0.5], key=jax.random.PRNGKey(2), n_permutations=500
    )
    assert float(pval) < 0.01


def test_sweep_matches_single_alpha_stats(rng):
    from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep

    x = rng.normal(size=(30, 3))
    y = rng.normal(size=(30, 3)) + 0.5
    alphas = [0.1, 1.0, 10.0]
    stats, pvals = mmd_permutation_test_sweep(
        x, y, alphas, key=jax.random.PRNGKey(0), n_permutations=100
    )
    assert stats.shape == (3,) and pvals.shape == (3,)
    for i, a in enumerate(alphas):
        np.testing.assert_allclose(
            float(stats[i]), naive_unbiased_mmd(x, y, [a]), rtol=1e-6
        )
    assert np.all((0 <= np.asarray(pvals)) & (np.asarray(pvals) <= 1))


def test_unequal_sample_sizes(rng):
    x = rng.normal(size=(30, 2))
    y = rng.normal(size=(50, 2))
    stat, pval = mmd_permutation_test(
        x, y, alphas=[1.0], key=jax.random.PRNGKey(3), n_permutations=100
    )
    assert np.isfinite(float(stat))
    assert 0.0 <= float(pval) <= 1.0
