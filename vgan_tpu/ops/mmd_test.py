"""Two-sample MMD goodness-of-fit test with bootstrap permutation p-values.

Native replacement for the external ``torch_two_sample.MMDStatistic``
dependency used by the reference's ``check_if_myopic``
(/root/reference/src/vgan.py:419-428): kernel ``k(x, y) = sum_a exp(-a |x-y|^2)``
over user-supplied ``alphas`` (NOTE: multiplier-style inverse bandwidths — the
reference passes its divisor-style "recommended bandwidth" directly as an
alpha; we reproduce that behavior at the API layer and flag it in docs), the
*unbiased* MMD estimate

    MMD_u = [sum_{i!=j} Kxx] / (n1 (n1-1)) + [sum_{i!=j} Kyy] / (n2 (n2-1))
            - 2 [sum Kxy] / (n1 n2)

and a permutation test: reassign the 2n pooled samples to the two groups
uniformly at random, recompute the statistic on the fixed pooled Gram matrix,
and report the fraction of permuted statistics >= the observed one.

TPU-first formulation: each permutation is an indicator row-vector a over the
pooled samples; all permuted statistics are computed at once from two batched
matmuls (``A @ K`` against ``A`` and ``1-A``), so the whole test is a single
jitted program on the MXU instead of a Cython loop.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from vgan_tpu.ops.mmd import pairwise_sq_dists


def alpha_gram(z: jax.Array, alphas: jax.Array) -> jax.Array:
    """Pooled Gram matrix ``sum_a exp(-a d2)`` over the stacked samples.

    ``alphas`` is a traced (k,) vector — only its LENGTH is compile-time
    static, so sweeping bandwidth values reuses one compiled program.
    """
    d2 = pairwise_sq_dists(z)
    k = jnp.zeros_like(d2)
    for i in range(alphas.shape[0]):
        k = k + jnp.exp(-alphas[i] * d2)
    return k


def _stat_from_indicators(k: jax.Array, a: jax.Array, n1: int, n2: int) -> jax.Array:
    """Unbiased MMD statistic(s) for indicator assignment rows ``a``.

    ``a`` is (p, m) in {0, 1} with each row summing to n1; returns (p,).
    Diagonal self-pairs are removed exactly (the pooled Gram diagonal is
    ``len(alphas)`` per entry, not 1, so we subtract the true diagonal mass).
    """
    b = 1.0 - a
    diag = jnp.diagonal(k)
    diag_total = jnp.sum(diag)
    a_diag = jnp.dot(a, diag)  # diagonal mass inside the X group, per row
    ak = jnp.dot(a, k, preferred_element_type=k.dtype)  # (p, m)
    s_xx_full = jnp.sum(ak * a, axis=-1)  # a K a^T, incl. diagonal
    s_xy = jnp.sum(ak * b, axis=-1)
    # 1 K 1^T = s_xx_full + s_yy_full + 2 s_xy  (K symmetric)
    s_yy_full = jnp.sum(k) - s_xx_full - 2.0 * s_xy
    s_xx = s_xx_full - a_diag
    s_yy = s_yy_full - (diag_total - a_diag)
    return (
        s_xx / (n1 * (n1 - 1))
        + s_yy / (n2 * (n2 - 1))
        - 2.0 * s_xy / (n1 * n2)
    )


@partial(jax.jit, static_argnames=("n1", "n2", "n_permutations"))
def _test_impl(
    z: jax.Array,
    key: jax.Array,
    n1: int,
    n2: int,
    n_permutations: int,
    alphas: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    k = alpha_gram(z, alphas)
    base = jnp.concatenate(
        [jnp.ones((n1,), dtype=k.dtype), jnp.zeros((n2,), dtype=k.dtype)]
    )
    observed = _stat_from_indicators(k, base[None, :], n1, n2)[0]
    perm_keys = jax.random.split(key, n_permutations)
    perms = jax.vmap(lambda kk: jax.random.permutation(kk, base))(perm_keys)
    perm_stats = _stat_from_indicators(k, perms, n1, n2)
    pval = jnp.mean((perm_stats >= observed).astype(k.dtype))
    return observed, pval


@partial(jax.jit, static_argnames=("n1", "n2", "n_permutations"))
def _test_impl_multi(
    z: jax.Array,
    key: jax.Array,
    n1: int,
    n2: int,
    n_permutations: int,
    alphas: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Batched single-alpha tests: one dispatch for a whole bandwidth sweep.

    The squared-distance matrix and the permutation set are computed once
    and shared across bandwidths (each bandwidth's kernel is an elementwise
    exp of the same d2); the statistic batch is a vmapped matmul stack.
    """
    d2 = pairwise_sq_dists(z)
    base = jnp.concatenate(
        [jnp.ones((n1,), dtype=d2.dtype), jnp.zeros((n2,), dtype=d2.dtype)]
    )
    perm_keys = jax.random.split(key, n_permutations)
    perms = jax.vmap(lambda kk: jax.random.permutation(kk, base))(perm_keys)

    def per_alpha(a):
        k = jnp.exp(-a * d2)
        observed = _stat_from_indicators(k, base[None, :], n1, n2)[0]
        perm_stats = _stat_from_indicators(k, perms, n1, n2)
        pval = jnp.mean((perm_stats >= observed).astype(k.dtype))
        return observed, pval

    return jax.vmap(per_alpha)(alphas)


# beyond this pooled-sample count the dense paths' (m, m) Gram gets routed
# to the streaming-Gram kernel (ops.pallas.gof_gram), which never holds it
DENSE_GOF_MAX_M = 8192
# the PRECISE (f64 host) path keeps the dense all-f64 oracle up to the
# round-2-documented boundary of 8192 samples per side (m = 16384, a
# 2 GiB f64 Gram); only past it does the Kahan-f32-kernel + f64-reduction
# streaming path take over — so the 4097..8192/side range keeps its exact
# dense precision (round-3 review finding)
DENSE_PRECISE_MAX_M = 16384


def mmd_permutation_test_sweep(
    x: jax.Array,
    y: jax.Array,
    alphas: Sequence[float],
    key: jax.Array,
    n_permutations: int = 1000,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-alpha tests for each alpha, batched into ONE compiled dispatch.

    Returns ``(statistics, p_values)``, each shape (len(alphas),).
    Sample counts past ``DENSE_GOF_MAX_M`` stream the Gram tile-by-tile —
    since round 3 the whole sweep rides ONE distance-stream pass (the
    kernel emits per-alpha C planes); on that route a ``mesh`` with a
    'data' axis shards the permutation rows over devices.
    """
    if x.shape[0] + y.shape[0] > DENSE_GOF_MAX_M:
        from vgan_tpu.ops.pallas.gof_gram import (
            mmd_permutation_test_tiled_sweep,
        )

        return mmd_permutation_test_tiled_sweep(
            x, y, alphas, key, n_permutations=n_permutations, mesh=mesh
        )
    z = jnp.concatenate([jnp.asarray(x), jnp.asarray(y)], axis=0)
    return _test_impl_multi(
        z,
        key,
        n1=int(x.shape[0]),
        n2=int(y.shape[0]),
        n_permutations=int(n_permutations),
        alphas=jnp.asarray([float(a) for a in alphas], dtype=z.dtype),
    )


def mmd_permutation_test(
    x: jax.Array,
    y: jax.Array,
    alphas: Sequence[float],
    key: jax.Array,
    n_permutations: int = 1000,
) -> Tuple[jax.Array, jax.Array]:
    """Run the two-sample MMD test. Returns ``(statistic, p_value)``.

    Sample counts past ``DENSE_GOF_MAX_M`` route to the streaming-Gram
    kernel (same sum-over-alphas pooled-kernel semantics, f32) instead of
    materializing the (m, m) Gram.
    """
    if x.shape[0] + y.shape[0] > DENSE_GOF_MAX_M:
        from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled

        return mmd_permutation_test_tiled(
            x, y, alphas, key, n_permutations=n_permutations
        )
    z = jnp.concatenate([jnp.asarray(x), jnp.asarray(y)], axis=0)
    return _test_impl(
        z,
        key,
        n1=int(x.shape[0]),
        n2=int(y.shape[0]),
        n_permutations=int(n_permutations),
        alphas=jnp.asarray([float(a) for a in alphas], dtype=z.dtype),
    )


def _stats_from_indicators_np(k, a, n1: int, n2: int):
    """float64 numpy twin of :func:`_stat_from_indicators` (same batched
    matmul formulation, double accumulation)."""
    import numpy as np

    b = 1.0 - a
    diag = np.diagonal(k)
    a_diag = a @ diag
    ak = a @ k
    s_xx_full = np.einsum("pm,pm->p", ak, a)
    s_xy = np.einsum("pm,pm->p", ak, b)
    s_yy_full = k.sum() - s_xx_full - 2.0 * s_xy
    s_xx = s_xx_full - a_diag
    s_yy = s_yy_full - (diag.sum() - a_diag)
    return (
        s_xx / (n1 * (n1 - 1))
        + s_yy / (n2 * (n2 - 1))
        - 2.0 * s_xy / (n1 * n2)
    )


def mmd_permutation_test_sweep_precise(
    x,
    y,
    alphas: Sequence[float],
    rng=None,
    n_permutations: int = 1000,
    permutations=None,
    mesh=None,
):
    """float64 host-side sweep — the PRECISE path for null-regime p-values.

    The unbiased statistic is a near-cancellation of O(m^2)-entry Gram sums:
    under the null it sits at ~1e-7 while an f32 accumulation of those sums
    carries ~1e-5 of rounding noise, which destroys the permutation ranking
    (p-values collapse to 0/1 garbage). The reference's torch_two_sample
    dependency accumulates its statistic in C double inside a Cython loop
    (the notebook's p=1.0 @ bandwidth 0.01, test.ipynb cell 14, is exactly
    this regime), so parity REQUIRES double accumulation. This path computes
    kernels and sums in float64 numpy with the same batched-matmul
    formulation as the jitted TPU path; use the f32 TPU sweep only for
    screening clearly-separated alternatives.

    Sample counts past ``DENSE_PRECISE_MAX_M`` (8192 per side — the dense
    f64 host Gram's documented budget) route to the device streaming
    kernel with Kahan-compensated C planes and float64 HOST reduction of
    the final quadratic forms (ops.pallas.gof_gram) — same validity in the
    null regime without the (m, m) f64 host Gram, so the precise test is
    uncapped since round 3. Per-entry kernel values are f32 there (vs f64
    here); the resulting statistic noise is ~(1/n)-scale, far below the
    permutation spread.

    Returns ``(statistics, p_values)`` numpy arrays of shape (len(alphas),).
    ``permutations``: optional pre-drawn (P, m) 0/1 indicator matrix (rows
    sum to n1) for oracle-exact comparisons in tests.
    """
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n1, n2 = x.shape[0], y.shape[0]
    m = n1 + n2
    if m > DENSE_PRECISE_MAX_M:
        from vgan_tpu.ops.pallas.gof_gram import (
            mmd_permutation_test_tiled_sweep,
        )

        if permutations is None:
            # draw with the host rng so determinism semantics match the
            # dense path (same rng -> same permutation set)
            rng = rng if rng is not None else np.random.default_rng(0)
            base = np.concatenate([np.ones(n1), np.zeros(n2)])
            permutations = np.stack(
                [rng.permutation(base) for _ in range(n_permutations)]
            )
        stats, pvals = mmd_permutation_test_tiled_sweep(
            x.astype(np.float32),
            y.astype(np.float32),
            alphas,
            jax.random.PRNGKey(0),  # unused: permutations are pre-drawn
            n_permutations=n_permutations,
            precision="float64",
            permutations=permutations,
            mesh=mesh,
        )
        return np.asarray(stats), np.asarray(pvals)
    z = np.concatenate([x, y], axis=0)
    zn = np.sum(z * z, axis=1)
    d2 = np.maximum(zn[:, None] + zn[None, :] - 2.0 * (z @ z.T), 0.0)

    if permutations is None:
        rng = rng if rng is not None else np.random.default_rng(0)
        base = np.concatenate([np.ones(n1), np.zeros(n2)])
        permutations = np.stack(
            [rng.permutation(base) for _ in range(n_permutations)]
        )
    base_row = np.concatenate([np.ones((1, n1)), np.zeros((1, n2))], axis=1)

    stats, pvals = [], []
    for alpha in alphas:
        k = np.exp(-float(alpha) * d2)
        observed = _stats_from_indicators_np(k, base_row, n1, n2)[0]
        perm_stats = _stats_from_indicators_np(k, permutations, n1, n2)
        stats.append(observed)
        pvals.append(float(np.mean(perm_stats >= observed)))
    return np.asarray(stats), np.asarray(pvals)
