"""Property-based tests (hypothesis): math invariants that must hold for
ARBITRARY inputs, not just the seeded fixtures — the SURVEY.md §4 property
tier. Shapes are fixed per test (one jit compile each); hypothesis fuzzes
the values.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

_SETTINGS = dict(max_examples=25, deadline=None)


def _finite_f32(shape, lo=-50.0, hi=50.0):
    return arrays(
        np.float32, shape,
        elements=st.floats(lo, hi, width=32, allow_nan=False,
                           allow_infinity=False),
    )


@settings(**_SETTINGS)
@given(x=_finite_f32((4, 10)))
def test_upper_softmax_value_partition(x):
    """Every output coord is EITHER exactly 1.0 (selected: softmax >= 1/d)
    OR the raw softmax value < 1/d — the reference's snap semantics
    (Generator.py:6-22) for arbitrary logits."""
    from vgan_tpu.ops.activations import upper_softmax

    d = x.shape[1]
    out = np.asarray(upper_softmax(jnp.asarray(x), axis=-1))
    s = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    snapped = s >= 1.0 / d
    np.testing.assert_array_equal(out[snapped], 1.0)
    np.testing.assert_allclose(out[~snapped], s[~snapped], rtol=1e-6)
    assert out[~snapped].max(initial=0.0) < 1.0 / d + 1e-6


@settings(**_SETTINGS)
@given(x=_finite_f32((4, 8)))
def test_upper_softmax_zero_grad_through_snapped(x):
    """Snapped (selected) coords are gradient-constants: a cotangent landing
    ONLY on selected outputs produces zero logit gradient (mask-as-constant,
    NOT straight-through) — for arbitrary logits."""
    from vgan_tpu.ops.activations import upper_softmax

    d = x.shape[1]

    def f(logits):
        out = upper_softmax(logits, axis=-1)
        sel = jax.nn.softmax(logits, axis=-1) >= 1.0 / d
        return jnp.sum(jnp.where(jax.lax.stop_gradient(sel), out, 0.0))

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(g, 0.0, atol=1e-7)


@settings(**_SETTINGS)
@given(x=_finite_f32((12, 5), -5, 5), y=_finite_f32((12, 5), -5, 5))
def test_mmd2_biased_symmetry_and_self_zero(x, y):
    """The biased V-statistic MMD^2 is symmetric, ~zero on identical
    samples, and non-negative (PD kernel) — for arbitrary data."""
    from vgan_tpu.ops.mmd import (
        mmd2_biased,
        pairwise_sq_dists,
        reference_bandwidth,
    )

    xj, yj = jnp.asarray(x), jnp.asarray(y)
    z = jnp.concatenate([xj, yj])
    # reference_bandwidth takes the pairwise SQUARED-DISTANCE matrix
    bw = float(reference_bandwidth(pairwise_sq_dists(z, z)))
    if bw <= 0:  # degenerate all-equal draw: bandwidth rule needs spread
        return
    bw = jnp.asarray(bw, jnp.float32)
    a = float(mmd2_biased(xj, yj, bw)[0])
    b = float(mmd2_biased(yj, xj, bw)[0])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert a >= -1e-5
    self_m = float(mmd2_biased(xj, xj, bw)[0])
    np.testing.assert_allclose(self_m, 0.0, atol=1e-4)


def _invariance_scorers(xtr, mask):
    """The per-family scorer closures for the masked-dims invariance
    property, split into two halves so the two test functions land on
    different xdist workers — a single process compiling all 22 scorer
    programs segfaults XLA:CPU on the degraded 1-vCPU host (the
    ROADMAP.md round-3 item 16 re-host incident; each half passes
    everywhere)."""
    from vgan_tpu.ensemble import (
        abod_scores_masked,
        cblof_scores_masked,
        cof_scores_masked,
        gmm_scores_masked,
        inne_scores_masked,
        kde_scores_masked,
        knn_scores_masked,
        loda_scores_masked,
        ae_scores_masked,
        dsvdd_scores_masked,
        kpca_scores_masked,
        lof_scores_masked,
        mahalanobis_scores_masked,
        mcd_scores_masked,
        mean_dist_scores_masked,
        ocsvm_scores_masked,
        pca_scores_masked,
        sampling_scores_masked,
        sod_scores_masked,
        sos_scores_masked,
        lmdd_scores_masked,
    )
    from vgan_tpu.ensemble.od import _iforest_adapter

    return (
        lambda a: knn_scores_masked(jnp.asarray(a), xtr, jnp.asarray(mask), 3),
        lambda a: abod_scores_masked(jnp.asarray(a), xtr, jnp.asarray(mask), 3),
        lambda a: cof_scores_masked(jnp.asarray(a), xtr, jnp.asarray(mask), 3),
        lambda a: cblof_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_clusters=3,
            kmeans_iter=5,
        ),
        lambda a: gmm_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_components=2,
            em_iter=5,
        ),
        lambda a: loda_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_projections=8, seed=1
        ),
        lambda a: inne_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_estimators=6, psi=4,
            seed=1,
        ),
        lambda a: kde_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), bandwidth=1.1
        ),
        lambda a: pca_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask)
        ),
        lambda a: sampling_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), subset_size=9, seed=1
        ),
        lambda a: kpca_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_components=5
        ),
        lambda a: mcd_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), n_starts=3, c_steps=5
        ),
        lambda a: ae_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), hidden=(8, 4),
            epochs=10,
        ),
        lambda a: dsvdd_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), hidden=(8, 4),
            epochs=10,
        ),
        lambda a: sod_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), 6, ref_set=4
        ),
        lambda a: sos_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), perplexity=5.0
        ),
        lambda a: lmdd_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), dis_measure="aad"
        ),
        lambda a: ocsvm_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), nu=0.4, iters=100
        ),
        lambda a: mean_dist_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), 3
        ),
        lambda a: lof_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask), 3
        ),
        lambda a: mahalanobis_scores_masked(
            jnp.asarray(a), xtr, jnp.asarray(mask)
        ),
        lambda a: _iforest_adapter(
            jnp.asarray(a), xtr, jnp.asarray(mask), 16
        ),
    )


def _check_invariance(x, noise, half):
    """Perturbing ONLY masked-out dimensions never changes a masked
    scorer's output — the defining invariant of subspace projection."""
    mask = np.array([1, 0, 1, 0, 1, 0], bool)
    xtr = jnp.asarray(x[:20])
    xte = x[20:].copy()
    xte_pert = xte.copy()
    xte_pert[:, ~mask] += noise[:, ~mask]
    scorers = _invariance_scorers(xtr, mask)
    mid = len(scorers) // 2
    for scorer in scorers[:mid] if half == 0 else scorers[mid:]:
        np.testing.assert_allclose(
            np.asarray(scorer(xte_pert)), np.asarray(scorer(xte)),
            rtol=1e-5, atol=1e-6,
        )


@settings(**_SETTINGS)
@given(x=_finite_f32((30, 6), -5, 5), noise=_finite_f32((10, 6), -5, 5))
def test_masked_scorers_ignore_masked_out_dims(x, noise):
    _check_invariance(x, noise, half=0)


@settings(**_SETTINGS)
@given(x=_finite_f32((30, 6), -5, 5), noise=_finite_f32((10, 6), -5, 5))
def test_masked_scorers_ignore_masked_out_dims_b(x, noise):
    _check_invariance(x, noise, half=1)


@settings(**_SETTINGS)
@given(s=_finite_f32((3, 20), -4, 4))
def test_combine_invariants(s):
    """'select' weights are a probability vector; 'max' dominates 'average'
    pointwise on any standardized score matrix."""
    from vgan_tpu.ensemble.hetero import _combine, _standardize

    z = _standardize(s.astype(np.float64))
    avg, _ = _combine(z, "average")
    mx, _ = _combine(z, "max")
    sel, w = _combine(z, "select")
    assert np.all(mx >= avg - 1e-9)
    assert w.shape == (3,) and np.all(w >= 0)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert np.all(np.isfinite(sel))


@settings(**_SETTINGS)
@given(x=_finite_f32((25, 4), -10, 10))
def test_dim_tail_scores_nonnegative_and_extremes_dominate(x):
    """COPOD/ECOD per-dim tail scores are non-negative for any data, and a
    query beyond the train maximum attains the per-dim maximal right-tail
    score (-log(1/n))."""
    from vgan_tpu.ensemble.od import copod_dim_scores, ecod_dim_scores

    xtr = jnp.asarray(x)
    n = x.shape[0]
    beyond = jnp.asarray(x.max(axis=0, keepdims=True) + 1.0)
    c = np.asarray(copod_dim_scores(beyond, xtr))
    assert np.all(c >= -1e-6)
    np.testing.assert_allclose(c[0], -np.log(1.0 / n), rtol=1e-5)
    e = np.asarray(ecod_dim_scores(beyond, xtr))  # (1, d, 3) planes
    assert np.all(e >= -1e-6)
    np.testing.assert_allclose(e[0, :, 1], -np.log(1.0 / n), rtol=1e-5)
