"""Tiled Pallas kernel for the GoF test at large sample counts (C14).

The permutation MMD test (ops/mmd_test.py) needs, for every permutation
indicator row a_p, the quadratic forms ``a_p K a_p^T`` / cross sums over the
per-bandwidth Grams ``K_a = exp(-alpha d2)``. The dense path materializes K
(m^2) — fine at the reference's count=500, impossible at m ~ 10^5. This
kernel computes ``C_a = A @ K_a`` for EVERY alpha in one pass, with K
RECOMPUTED from z tile-by-tile (flash-attention-style: d2 from a d-chunked
MXU dot, the alpha-kernels on the VPU, and the (n_alphas, P, TILE) output
planes streamed) — no m x m buffer at any point, and a k-bandwidth sweep
pays the dominant 2 m^2 d distance stream ONCE instead of k times.

Numerics (round 3): the per-tile partials are Kahan-compensated into the C
accumulators (error stays ~1 ulp of |C| regardless of the tile count), and
the ``precise`` reduction computes the final quadratic forms in float64 on
host from the fetched C planes. The unbiased statistic is a
near-cancellation of O(m^2)-entry sums: under the null it sits at ~1e-7
while f32 FINAL sums carry ~eps*|s_xx| ~ 1 of rounding — float64 reduction
is what keeps null-regime p-values valid at any m (per-entry f32 kernel
rounding contributes only ~(1/n)-scale noise to the statistic, far below
the permutation spread). This removes round 2's count<=8192 cap on
``check_if_myopic(precision='float64')``.

The kernel zeroes the Gram diagonal (the unbiased statistic excludes
self-pairs), and all per-permutation statistics then come from C and A in
O(P m):  s_xx(p) = sum_j A[p, j] C[p, j],   s_xy, s_yy analogous.

Reference obligation: torch_two_sample.MMDStatistic usage at
/root/reference/src/vgan.py:419-428 (the capability being scaled).
SURVEY.md section 2c, component C14.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgan_tpu.ops.pallas.mmd_gram import (
    _KERNEL_VMEM_LIMIT,
    _pad_layout,
    _round_up,
)

TILE_M = 256
TILE_P = 512
# the kernel's output planes + Kahan scratch scale linearly with the alpha
# count (~2 x n_alphas x TILE_P x TILE_M x 4 B resident); chunk long
# bandwidth sweeps so VMEM stays bounded (each chunk re-streams distances
# — the sweep's one-pass saving applies within a chunk)
MAX_ALPHAS_PER_PASS = 8


def _ak_kernel(
    zi_ref,   # K row tile source (TILE_M, tile_d) — the j index of K
    zj_ref,   # K col tile source (TILE_M, tile_d) — the i (output) index
    ni_ref,
    nj_ref,
    a_ref,    # (TILE_P, TILE_M) block of A aligned with zi rows
    alphas_ref,  # (1, n_alphas) SMEM
    c_ref,    # (n_alphas, TILE_P, TILE_M) output planes, Kahan-accumulated
    d2_scratch,
    comp_scratch,  # (n_alphas, TILE_P, TILE_M) Kahan compensation
    *,
    m: int,
    n_alphas: int,
    n_kd: int,
):
    i, j, kd = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, kd == 0))
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)
        comp_scratch[:] = jnp.zeros_like(comp_scratch)

    @pl.when(kd == 0)
    def _():
        d2_scratch[:] = jnp.zeros_like(d2_scratch)

    # d2 tile for K[j-rows, i-cols]
    d2_scratch[:] += -2.0 * jnp.dot(
        zi_ref[:], zj_ref[:].T, preferred_element_type=jnp.float32
    )

    @pl.when(kd == n_kd - 1)
    def _():
        d2 = jnp.maximum(d2_scratch[:] + ni_ref[:] + nj_ref[:].T, 0.0)
        rows = j * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cols = i * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        # zero the diagonal in-kernel: the unbiased statistic excludes
        # self-pairs, and the numerical diagonal of the streamed Gram is
        # NOT exactly 1 (the chunked dot's d2_ii has f32 residual), so a
        # constant host-side correction would bias the statistic —
        # excluding it here matches the dense path's actual-diagonal
        # subtraction exactly-by-construction
        valid = (rows < m) & (cols < m) & (rows != cols)
        a_blk = a_ref[:]
        for a_idx in range(n_alphas):
            k = jnp.where(valid, jnp.exp(-alphas_ref[0, a_idx] * d2), 0.0)
            # C_a[:, i-cols] += A[:, j-rows] @ K_a[j-rows, i-cols], with
            # Kahan compensation across the j-tile partials so C carries
            # ~1 ulp of error however many tiles are accumulated
            partial = jnp.dot(a_blk, k, preferred_element_type=jnp.float32)
            y = partial - comp_scratch[a_idx]
            t = c_ref[a_idx] + y
            comp_scratch[a_idx] = (t - c_ref[a_idx]) - y
            c_ref[a_idx] = t


@functools.partial(
    jax.jit, static_argnames=("m", "n_alphas", "tile_d", "interpret")
)
def _a_times_k(
    z_pad: jax.Array,
    norms_pad: jax.Array,
    a_pad: jax.Array,
    alphas: jax.Array,
    m: int,
    n_alphas: int,
    tile_d: int,
    interpret: bool = False,
) -> jax.Array:
    """``C_a = A @ K_a(z)`` for every alpha, without materializing any K.

    Returns (n_alphas, P, M); shapes padded to tiles. One pass over the
    distance stream covers the whole alpha sweep.
    """
    M, D = z_pad.shape
    P = a_pad.shape[0]
    grid = (M // TILE_M, M // TILE_M, D // tile_d)
    n_kd = D // tile_d
    kernel = functools.partial(
        _ak_kernel, m=m, n_alphas=n_alphas, n_kd=n_kd
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, tile_d), lambda i, j, kd: (j, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, tile_d), lambda i, j, kd: (i, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j, kd: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, TILE_M), lambda i, j, kd: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_alphas), lambda i, j, kd: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_alphas, P, TILE_M), lambda i, j, kd: (0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_alphas, P, M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_M, TILE_M), jnp.float32),
            pltpu.VMEM((n_alphas, P, TILE_M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * M * D + 2 * M * M * P * n_alphas,
            bytes_accessed=(M // TILE_M) * (2 * M * D + M * P) * 4,
            transcendentals=M * M * n_alphas,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(z_pad, z_pad, norms_pad, norms_pad, a_pad,
      alphas.reshape(1, -1).astype(jnp.float32))


def _a_times_k_chunked(z_pad, norms_pad, a_pad, alphas_arr, m, tile_d,
                       interpret):
    """C planes for any alpha count: chunks the sweep at
    MAX_ALPHAS_PER_PASS per kernel call so the per-alpha output planes +
    Kahan scratch stay within the VMEM budget (long sweeps re-stream the
    distances once per chunk)."""
    n_alphas = int(alphas_arr.shape[0])
    if n_alphas <= MAX_ALPHAS_PER_PASS:
        return _a_times_k(
            z_pad, norms_pad, a_pad, alphas_arr, m,
            n_alphas=n_alphas, tile_d=tile_d, interpret=interpret,
        )
    parts = []
    for s0 in range(0, n_alphas, MAX_ALPHAS_PER_PASS):
        sub = alphas_arr[s0 : s0 + MAX_ALPHAS_PER_PASS]
        parts.append(
            _a_times_k(
                z_pad, norms_pad, a_pad, sub, m,
                n_alphas=int(sub.shape[0]), tile_d=tile_d,
                interpret=interpret,
            )
        )
    return jnp.concatenate(parts, axis=0)


def _stats_from_c_f32(c, a, totals, n1, n2):
    """(n_alphas, n_rows) statistics from C planes — f32, on device."""
    b = 1.0 - a
    s_xx = jnp.einsum("apm,pm->ap", c, a)
    s_xy = jnp.einsum("apm,pm->ap", c, b)
    s_yy = totals[:, None] - s_xx - 2.0 * s_xy
    return (
        s_xx / (n1 * (n1 - 1))
        + s_yy / (n2 * (n2 - 1))
        - 2.0 * s_xy / (n1 * n2)
    )


def _stats_for_rows(
    a_rows: jax.Array,
    z_pad: jax.Array,
    norms: jax.Array,
    alphas_arr: jax.Array,
    n1: int,
    n2: int,
    m: int,
    tile_d: int,
    interpret: bool,
    precise: bool = False,
) -> jax.Array:
    """Unbiased two-sample MMD statistics for a block of indicator rows.

    ``a_rows`` is (n_rows, M) with the indicator in the first ``m`` columns
    (zero-padded); rows are independent (C = A @ K row-wise), which is what
    makes the permutation axis embarrassingly parallel. Rows are processed
    in TILE_P-sized chunks (the kernel's A/C blocks live whole in VMEM), an
    all-ones row appended per chunk for the pooled total. All-zero caller
    padding rows yield garbage statistics the caller drops.

    Returns (n_alphas, n_rows). ``precise=True`` reduces the quadratic
    forms in float64 on HOST from the fetched C planes (valid null-regime
    p-values at any m; not shard_map-compatible — single-device only).
    """
    n_rows, M = a_rows.shape
    n_alphas = int(alphas_arr.shape[0])
    ones_row = jnp.zeros((1, M), jnp.float32).at[0, :m].set(1.0)

    # chunk the permutation axis: the kernel holds its whole A/C block in
    # VMEM (a (P, TILE_M) pair per alpha), so P must be bounded — TILE_P
    # rows per kernel call keeps the blocks ~0.5 MB each while amortizing
    # the distance stream over TILE_P permutations
    stats_chunks = []
    totals = None
    for start in range(0, n_rows, TILE_P):
        block = a_rows[start : start + TILE_P]
        n_blk = block.shape[0]
        stacked = jnp.concatenate([block, ones_row], axis=0)
        P = _round_up(stacked.shape[0], 8)
        a_pad = (
            jnp.zeros((P, M), jnp.float32).at[: stacked.shape[0]].set(stacked)
        )
        c = _a_times_k_chunked(
            z_pad, norms, a_pad, alphas_arr, m, tile_d, interpret
        )
        if precise:
            c_np = np.asarray(c, dtype=np.float64)
            a_np = np.asarray(a_pad[:n_blk, :m], dtype=np.float64)
            if totals is None:
                totals = c_np[:, n_blk, :m].sum(axis=1)  # 1 K_offdiag 1^T
            cb = c_np[:, :n_blk, :m]
            b_np = 1.0 - a_np
            s_xx = np.einsum("apm,pm->ap", cb, a_np)
            s_xy = np.einsum("apm,pm->ap", cb, b_np)
            s_yy = totals[:, None] - s_xx - 2.0 * s_xy
            stats_chunks.append(
                s_xx / (n1 * (n1 - 1))
                + s_yy / (n2 * (n2 - 1))
                - 2.0 * s_xy / (n1 * n2)
            )
        else:
            if totals is None:
                totals = jnp.sum(c[:, n_blk, :m], axis=1)
            stats_chunks.append(
                _stats_from_c_f32(
                    c[:, :n_blk, :m], a_pad[:n_blk, :m], totals, n1, n2
                )
            )
    if precise:
        return np.concatenate(stats_chunks, axis=1)
    return jnp.concatenate(stats_chunks, axis=1)


def _c_planes_sharded(a_pad, z_pad, norms, alphas_arr, m, tile_d,
                      interpret, mesh):
    """C planes for ``a_pad`` with the permutation rows sharded over the
    mesh's 'data' axis (each device streams its local rows against
    replicated z). ``a_pad`` rows must divide by 8 * n_devices."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    n_alphas = int(alphas_arr.shape[0])

    def local(a_loc, z_pad, norms):
        return _a_times_k_chunked(
            z_pad, norms, a_loc, alphas_arr, m, tile_d, interpret
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            PartitionSpec("data", None),
            PartitionSpec(),
            PartitionSpec(),
        ),
        out_specs=PartitionSpec(None, "data", None),
        check_vma=False,
    )
    repl = NamedSharding(mesh, PartitionSpec())
    return fn(
        jax.device_put(
            a_pad, NamedSharding(mesh, PartitionSpec("data", None))
        ),
        jax.device_put(z_pad, repl),
        jax.device_put(norms, repl),
    )


def _stats_for_rows_precise_mesh(
    a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret, mesh
):
    """float64-reduced statistics with the permutation axis mesh-sharded.

    Devices compute Kahan-compensated f32 C planes for their local
    indicator rows (one distance stream per device per chunk); the host
    fetches the planes and reduces the quadratic forms in float64 —
    precision identical to the single-device precise path, throughput
    scaled by the mesh (round 3; removes the precise-vs-mesh exclusivity).
    """
    n_dev = mesh.shape["data"]
    n_rows, M = a_rows.shape
    ones_row = jnp.zeros((1, M), jnp.float32).at[0, :m].set(1.0)
    align = 8 * n_dev
    chunk_rows = TILE_P * n_dev

    stats_chunks = []
    totals = None
    for start in range(0, n_rows, chunk_rows):
        block = a_rows[start : start + chunk_rows]
        n_blk = block.shape[0]
        stacked = jnp.concatenate([block, ones_row], axis=0)
        P = _round_up(stacked.shape[0], align)
        a_pad = (
            jnp.zeros((P, M), jnp.float32).at[: stacked.shape[0]].set(stacked)
        )
        c = _c_planes_sharded(
            a_pad, z_pad, norms, alphas_arr, m, tile_d, interpret, mesh
        )
        c_np = np.asarray(c, dtype=np.float64)
        a_np = np.asarray(a_pad[:n_blk, :m], dtype=np.float64)
        if totals is None:
            totals = c_np[:, n_blk, :m].sum(axis=1)  # 1 K_offdiag 1^T
        cb = c_np[:, :n_blk, :m]
        b_np = 1.0 - a_np
        s_xx = np.einsum("apm,pm->ap", cb, a_np)
        s_xy = np.einsum("apm,pm->ap", cb, b_np)
        s_yy = totals[:, None] - s_xx - 2.0 * s_xy
        stats_chunks.append(
            s_xx / (n1 * (n1 - 1))
            + s_yy / (n2 * (n2 - 1))
            - 2.0 * s_xy / (n1 * n2)
        )
    return np.concatenate(stats_chunks, axis=1)


def _pooled_pad_rows(x, y, key, n_permutations, permutations=None):
    """Shared setup: padded z/norms and the [observed; permutations] rows.

    ``permutations``: optional pre-drawn (P, m) 0/1 indicator matrix (rows
    sum to n1) replacing the key-drawn set — for oracle-exact comparisons
    and host-rng determinism parity with the dense precise path.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n1, n2 = x.shape[0], y.shape[0]
    m = n1 + n2
    d = x.shape[1]
    M, D, tile_d = _pad_layout(m, d)
    M = _round_up(M, TILE_M)

    z = jnp.concatenate([x, y], axis=0)
    z_pad = jnp.zeros((M, D), jnp.float32).at[:m, :d].set(z)
    norms = jnp.sum(z_pad * z_pad, axis=1, keepdims=True)

    base = jnp.concatenate(
        [jnp.ones((n1,), jnp.float32), jnp.zeros((n2,), jnp.float32)]
    )
    if permutations is None:
        perm_keys = jax.random.split(key, n_permutations)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, base))(
            perm_keys
        )
    else:
        perms = jnp.asarray(permutations, jnp.float32)
    # rows: [observed, permutations...]; padded to M columns
    a_rows = jnp.concatenate([base[None, :], perms], axis=0)
    n_rows = a_rows.shape[0]
    a_rows = jnp.zeros((n_rows, M), jnp.float32).at[:, :m].set(a_rows)
    return z_pad, norms, a_rows, n1, n2, m, tile_d


def mmd_permutation_test_tiled_sweep(
    x: jax.Array,
    y: jax.Array,
    alphas,
    key: jax.Array,
    n_permutations: int = 1000,
    interpret: bool = None,
    mesh=None,
    precision: str = "float32",
    permutations=None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-alpha large-m permutation tests in ONE distance-stream pass.

    Returns ``(statistics, p_values)``, each shape (n_alphas,). Same
    statistic and permutation semantics as ops.mmd_test._test_impl_multi,
    but the per-alpha Grams never materialize: the kernel emits all
    ``C_a = A @ K_a`` planes while streaming distances once, so a
    k-bandwidth sweep costs ~one single-alpha pass (the dominant 2 m^2 d
    term is shared; only the O(m^2 P) A@K matmuls and exps scale with k).

    ``precision='float64'`` reduces the final quadratic forms in float64 on
    host (Kahan-compensated C planes fetched once per TILE_P chunk) —
    REQUIRED for valid p-values near the null, where the ~1e-7 statistic
    sits below f32 rounding of the O(m^2)-magnitude sums. Composes with
    ``mesh``: the C planes are computed on device shards and the f64
    reduction happens after the host fetch, so precision is identical to
    the single-device precise path.

    With ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis) the
    permutation rows shard over devices — each device streams its local
    C planes against replicated z (SURVEY.md section 2b: the GoF test's
    parallel axis; no collectives until the host gather of the (P,)
    statistics). Scaling note: the A@K term (2 m^2 P_loc k flops) shards,
    but every device still recomputes the full distance stream (2 m^2 d
    flops), so near-linear speedup requires P * n_alphas >> d.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    precise = precision == "float64"
    z_pad, norms, a_rows, n1, n2, m, tile_d = _pooled_pad_rows(
        x, y, key, n_permutations, permutations
    )
    alphas_arr = jnp.asarray(
        [float(a) for a in np.asarray(alphas).ravel()], jnp.float32
    )
    n_rows = a_rows.shape[0]

    if precise and mesh is not None:
        stats = _stats_for_rows_precise_mesh(
            a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret,
            mesh,
        )
    elif mesh is None:
        stats = _stats_for_rows(
            a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret,
            precise=precise,
        )
    else:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape["data"]
        pad = (-n_rows) % n_dev
        a_sh = jnp.concatenate(
            [a_rows, jnp.zeros((pad, a_rows.shape[1]), jnp.float32)], axis=0
        )

        def local(a_loc, z_pad, norms):
            return _stats_for_rows(
                a_loc, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret
            )

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec("data", None),
                PartitionSpec(),
                PartitionSpec(),
            ),
            out_specs=PartitionSpec(None, "data"),
            check_vma=False,
        )
        repl = NamedSharding(mesh, PartitionSpec())
        stats = fn(
            jax.device_put(
                a_sh, NamedSharding(mesh, PartitionSpec("data", None))
            ),
            jax.device_put(z_pad, repl),
            jax.device_put(norms, repl),
        )[:, :n_rows]

    stats = np.asarray(stats)
    observed = stats[:, 0]
    pvals = np.mean(stats[:, 1:] >= observed[:, None], axis=1)
    return jnp.asarray(observed), jnp.asarray(pvals)


def mmd_permutation_test_tiled(
    x: jax.Array,
    y: jax.Array,
    alphas,
    key: jax.Array,
    n_permutations: int = 1000,
    interpret: bool = None,
    mesh=None,
    precision: str = "float32",
) -> Tuple[jax.Array, jax.Array]:
    """Large-m counterpart of ``mmd_permutation_test`` (streaming K).

    Pools the alphas into one kernel ``K = sum_a K_a`` (linearity of
    C = A @ K lets the per-alpha planes sum after the fact) and returns the
    scalar ``(statistic, p_value)``. See
    :func:`mmd_permutation_test_tiled_sweep` for the per-alpha sweep and
    the ``precision`` / ``mesh`` semantics.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    precise = precision == "float64"
    z_pad, norms, a_rows, n1, n2, m, tile_d = _pooled_pad_rows(
        x, y, key, n_permutations
    )
    alphas_arr = jnp.asarray(
        [float(a) for a in np.asarray(alphas).ravel()], jnp.float32
    )
    n_rows = a_rows.shape[0]

    if precise and mesh is not None:
        stats = _stats_for_rows_precise_mesh(
            a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret,
            mesh,
        ).sum(axis=0)  # pool alphas (linear in K)
    elif mesh is None:
        stats = _stats_for_rows(
            a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret,
            precise=precise,
        )
        stats = np.asarray(stats).sum(axis=0)  # pool alphas (linear in K)
    else:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape["data"]
        pad = (-n_rows) % n_dev
        a_sh = jnp.concatenate(
            [a_rows, jnp.zeros((pad, a_rows.shape[1]), jnp.float32)], axis=0
        )

        def local(a_loc, z_pad, norms):
            return jnp.sum(
                _stats_for_rows(
                    a_loc, z_pad, norms, alphas_arr, n1, n2, m, tile_d,
                    interpret,
                ),
                axis=0,
            )

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec("data", None),
                PartitionSpec(),
                PartitionSpec(),
            ),
            out_specs=PartitionSpec("data"),
            check_vma=False,
        )
        repl = NamedSharding(mesh, PartitionSpec())
        stats = np.asarray(
            fn(
                jax.device_put(
                    a_sh, NamedSharding(mesh, PartitionSpec("data", None))
                ),
                jax.device_put(z_pad, repl),
                jax.device_put(norms, repl),
            )[:n_rows]
        )

    observed = stats[0]
    pval = np.mean(stats[1:] >= observed)
    return jnp.asarray(observed), jnp.asarray(pval)
