"""Two-sample MMD permutation test: statistic correctness vs a naive numpy
oracle, and statistical sanity of the p-values (calibration under H0, power
under a clear mean shift)."""

import jax
import jax.numpy as jnp
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


def test_precise_path_matches_tts_oracle(rng):
    """float64 precise path == a literal transcription of the
    torch_two_sample semantics (unbiased statistic, exp(-alpha d^2) kernel,
    permutation count), on a SHARED permutation set -> exact agreement."""
    from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep_precise

    n1, n2, d = 40, 40, 6
    x = rng.normal(size=(n1, d))
    y = rng.normal(size=(n2, d)) * 1.4 + 0.3
    m = n1 + n2
    base = np.concatenate([np.ones(n1), np.zeros(n2)])
    perms = np.stack([rng.permutation(base) for _ in range(400)])
    alphas = [0.01, 0.5, 5.0]

    stats, pvals = mmd_permutation_test_sweep_precise(
        x, y, alphas, permutations=perms
    )

    z = np.concatenate([x, y])
    d2 = ((z[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    for ai, alpha in enumerate(alphas):
        k = np.exp(-alpha * d2)

        def stat(mask):
            a = mask.astype(bool)
            kxx, kyy, kxy = k[np.ix_(a, a)], k[np.ix_(~a, ~a)], k[np.ix_(a, ~a)]
            return (
                (kxx.sum() - np.trace(kxx)) / (n1 * (n1 - 1))
                + (kyy.sum() - np.trace(kyy)) / (n2 * (n2 - 1))
                - 2 * kxy.sum() / (n1 * n2)
            )

        obs = stat(base)
        p_oracle = np.mean([stat(p_) >= obs for p_ in perms])
        np.testing.assert_allclose(stats[ai], obs, rtol=1e-10)
        assert pvals[ai] == p_oracle, f"alpha={alpha}"


def test_sweep_matches_single_alpha_path(rng):
    """_test_impl_multi (bandwidth sweep) == _test_impl per alpha with the
    same key: identical permutation draws -> identical p-values."""
    import jax

    from vgan_tpu.ops.mmd_test import (
        mmd_permutation_test,
        mmd_permutation_test_sweep,
    )

    x = jnp.asarray(rng.normal(size=(30, 5)).astype(np.float32))
    y = jnp.asarray((rng.normal(size=(26, 5)) + 0.8).astype(np.float32))
    key = jax.random.PRNGKey(3)
    alphas = [0.05, 1.0, 10.0]
    stats_sw, ps_sw = mmd_permutation_test_sweep(
        x, y, alphas, key, n_permutations=200
    )
    for i, a in enumerate(alphas):
        s1, p1 = mmd_permutation_test(x, y, [a], key, n_permutations=200)
        np.testing.assert_allclose(float(stats_sw[i]), float(s1), rtol=1e-5)
        np.testing.assert_allclose(float(ps_sw[i]), float(p1), atol=1e-9)


def test_tiled_gof_matches_dense(rng):
    """C14: the streaming-Gram GoF kernel (no m^2 buffer) matches the dense
    jitted path: identical permutation draws -> identical statistics and
    p-values up to f32 tile-reduction order."""
    from vgan_tpu.ops.mmd_test import mmd_permutation_test
    from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled

    x = rng.normal(size=(60, 7)).astype(np.float32)
    y = (rng.normal(size=(48, 7)) * 1.3 + 0.6).astype(np.float32)
    key = jax.random.PRNGKey(11)
    for alpha in (0.05, 1.0):
        s_d, p_d = mmd_permutation_test(x, y, [alpha], key, n_permutations=150)
        s_t, p_t = mmd_permutation_test_tiled(
            x, y, [alpha], key, n_permutations=150
        )
        # in-kernel diagonal zeroing makes the tiled statistic agree with
        # the dense path to reduction-order noise (~3e-5 rel on chip)
        np.testing.assert_allclose(float(s_t), float(s_d), rtol=2e-3,
                                   atol=1e-7)
        np.testing.assert_allclose(float(p_t), float(p_d), atol=0.03)


def test_tiled_gof_multi_alpha_sum(rng):
    """Multi-alpha kernels sum inside the tile (torch_two_sample semantics:
    alphas accumulate into one pooled Gram)."""
    from vgan_tpu.ops.mmd_test import mmd_permutation_test
    from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled

    x = rng.normal(size=(30, 4)).astype(np.float32)
    y = (rng.normal(size=(30, 4)) + 1.0).astype(np.float32)
    key = jax.random.PRNGKey(2)
    alphas = [0.1, 1.0, 10.0]
    s_d, _ = mmd_permutation_test(x, y, alphas, key, n_permutations=50)
    s_t, _ = mmd_permutation_test_tiled(x, y, alphas, key, n_permutations=50)
    np.testing.assert_allclose(float(s_t), float(s_d), rtol=2e-3, atol=1e-7)


def test_permutation_test_routes_large_m_to_tiled(rng, monkeypatch):
    """mmd_permutation_test must stream past DENSE_GOF_MAX_M instead of
    materializing the (m, m) Gram (review finding: only the sweep routed)."""
    import vgan_tpu.ops.mmd_test as mt
    from vgan_tpu.ops.pallas import gof_gram

    x = rng.normal(size=(30, 4)).astype(np.float32)
    y = (rng.normal(size=(30, 4)) + 1.0).astype(np.float32)
    key = jax.random.PRNGKey(3)

    calls = []
    real = gof_gram.mmd_permutation_test_tiled

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(gof_gram, "mmd_permutation_test_tiled", spy)
    monkeypatch.setattr(mt, "DENSE_GOF_MAX_M", 32)
    s, p = mt.mmd_permutation_test(x, y, [0.5], key, n_permutations=40)
    assert calls, "tiled path not used past DENSE_GOF_MAX_M"
    s_d, _ = mt._test_impl(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)]), key,
        n1=30, n2=30, n_permutations=40,
        alphas=jnp.asarray([0.5], jnp.float32),
    )
    np.testing.assert_allclose(float(s), float(s_d), rtol=2e-3, atol=1e-7)


def test_tiled_gof_chunks_permutation_axis(rng):
    """Permutation counts past TILE_P chunk into multiple kernel calls with
    identical statistics semantics (VMEM stays bounded)."""
    from vgan_tpu.ops.pallas.gof_gram import TILE_P, mmd_permutation_test_tiled

    x = rng.normal(size=(20, 3)).astype(np.float32)
    y = (rng.normal(size=(20, 3)) * 1.4).astype(np.float32)
    key = jax.random.PRNGKey(9)
    n_perm = TILE_P + 37  # forces a second chunk
    s, p = mmd_permutation_test_tiled(x, y, [1.0], key, n_permutations=n_perm)
    from vgan_tpu.ops.mmd_test import mmd_permutation_test

    s_d, p_d = mmd_permutation_test(x, y, [1.0], key, n_permutations=n_perm)
    np.testing.assert_allclose(float(s), float(s_d), rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(float(p), float(p_d), atol=0.05)


def test_tiled_sweep_one_pass_matches_per_alpha(rng):
    """Round 3: the k-bandwidth tiled sweep rides ONE distance-stream pass
    (per-alpha C planes) and must agree with per-alpha pooled calls."""
    from vgan_tpu.ops.pallas.gof_gram import (
        mmd_permutation_test_tiled,
        mmd_permutation_test_tiled_sweep,
    )

    x = rng.normal(size=(40, 5)).astype(np.float32)
    y = (rng.normal(size=(40, 5)) + 0.8).astype(np.float32)
    key = jax.random.PRNGKey(21)
    alphas = [0.05, 0.5, 5.0]
    s_sw, p_sw = mmd_permutation_test_tiled_sweep(
        x, y, alphas, key, n_permutations=120
    )
    assert s_sw.shape == (3,) and p_sw.shape == (3,)
    for i, a in enumerate(alphas):
        s_1, p_1 = mmd_permutation_test_tiled(
            x, y, [a], key, n_permutations=120
        )
        np.testing.assert_allclose(
            float(s_sw[i]), float(s_1), rtol=2e-3, atol=1e-7
        )
        np.testing.assert_allclose(float(p_sw[i]), float(p_1), atol=0.03)


def test_tiled_precise_matches_f64_oracle_null_regime(rng):
    """The Kahan-C + f64-host-reduction path must reproduce the numpy-f64
    oracle's statistics and p-values on a SHARED permutation set in the
    null regime (tiny statistics below f32 rounding of the big sums) —
    exactly where the plain f32 sweep collapses."""
    from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep_precise
    from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled_sweep

    n = 300
    x = rng.normal(size=(n, 6)).astype(np.float32)
    y = rng.normal(size=(n, 6)).astype(np.float32)  # same distribution
    base = np.concatenate([np.ones(n), np.zeros(n)])
    perms = np.stack([rng.permutation(base) for _ in range(200)])
    alphas = [0.01, 1.0]

    s_ref, p_ref = mmd_permutation_test_sweep_precise(
        x, y, alphas, n_permutations=200, permutations=perms
    )
    s_dev, p_dev = mmd_permutation_test_tiled_sweep(
        x, y, alphas, jax.random.PRNGKey(0), n_permutations=200,
        precision="float64", permutations=perms,
    )
    # per-entry f32 kernel rounding leaves ~(1/n)-scale noise; the oracle
    # statistics here are O(1e-4..1e-2)
    np.testing.assert_allclose(
        np.asarray(s_dev), s_ref, rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(p_dev), p_ref, atol=0.03)


def test_precise_sweep_routes_large_m_uncapped(rng, monkeypatch):
    """mmd_permutation_test_sweep_precise past DENSE_PRECISE_MAX_M streams on
    device (f64 host reduction) instead of materializing the host Gram —
    and still matches the dense f64 oracle on the same rng stream."""
    import vgan_tpu.ops.mmd_test as mt

    n = 80
    x = rng.normal(size=(n, 4)).astype(np.float32)
    y = rng.normal(size=(n, 4)).astype(np.float32)

    s_dense, p_dense = mt.mmd_permutation_test_sweep_precise(
        x, y, [0.5], rng=np.random.default_rng(5), n_permutations=100
    )
    monkeypatch.setattr(mt, "DENSE_PRECISE_MAX_M", 64)
    s_tiled, p_tiled = mt.mmd_permutation_test_sweep_precise(
        x, y, [0.5], rng=np.random.default_rng(5), n_permutations=100
    )
    np.testing.assert_allclose(
        np.asarray(s_tiled), s_dense, rtol=5e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(p_tiled), p_dense, atol=0.02)


def test_tiled_precise_mesh_matches_single_device(rng):
    """precision='float64' composes with mesh= (round 3): device-sharded
    Kahan C planes + f64 host reduction == the single-device precise path
    on a shared permutation set."""
    from jax.sharding import Mesh

    from vgan_tpu.ops.pallas.gof_gram import (
        TILE_P,
        mmd_permutation_test_tiled,
        mmd_permutation_test_tiled_sweep,
    )

    n = 120
    x = rng.normal(size=(n, 5)).astype(np.float32)
    y = rng.normal(size=(n, 5)).astype(np.float32)
    base = np.concatenate([np.ones(n), np.zeros(n)])
    n_perm = TILE_P * 8 + 23  # forces a second sharded chunk
    perms = np.stack([rng.permutation(base) for _ in range(n_perm)])
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

    s1, p1 = mmd_permutation_test_tiled_sweep(
        x, y, [0.02, 1.0], jax.random.PRNGKey(0), n_permutations=n_perm,
        precision="float64", permutations=perms,
    )
    s8, p8 = mmd_permutation_test_tiled_sweep(
        x, y, [0.02, 1.0], jax.random.PRNGKey(0), n_permutations=n_perm,
        precision="float64", permutations=perms, mesh=mesh,
    )
    # chunk grouping differs (TILE_P vs TILE_P * n_dev rows per kernel
    # call), so f32 C-plane rounding patterns differ at ~1e-8 abs
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=0.005)

    # pooled entry point too
    sp1, pp1 = mmd_permutation_test_tiled(
        x, y, [0.02, 1.0], jax.random.PRNGKey(5), n_permutations=60,
        precision="float64",
    )
    sp8, pp8 = mmd_permutation_test_tiled(
        x, y, [0.02, 1.0], jax.random.PRNGKey(5), n_permutations=60,
        precision="float64", mesh=mesh,
    )
    np.testing.assert_allclose(float(sp8), float(sp1), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(pp8), float(pp1), atol=0.02)
