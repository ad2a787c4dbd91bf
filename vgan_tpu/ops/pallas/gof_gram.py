"""Tiled Pallas kernel for the GoF test at large sample counts (C14).

The permutation MMD test (ops/mmd_test.py) needs, for every permutation
indicator row a_p, the quadratic forms ``a_p K a_p^T`` / cross sums over the
pooled Gram ``K = sum_alpha exp(-alpha d2)``. The dense path materializes K
(m^2) — fine at the reference's count=500, impossible at m ~ 10^5. This
kernel computes ``C = A @ K`` with K RECOMPUTED from z tile-by-tile
(flash-attention-style: d2 from a d-chunked MXU dot, the alpha-kernel on
the VPU, and the (P, TILE) output streamed) — no m x m buffer at any point,
so the f32 GoF scales with the same structure as the training kernels.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgan_tpu.ops.pallas.mmd_gram import _pad_layout, _round_up

TILE_M = 256
TILE_P = 512


def _ak_kernel(
    zi_ref,   # K row tile source (TILE_M, tile_d) — the j index of K
    zj_ref,   # K col tile source (TILE_M, tile_d) — the i (output) index
    ni_ref,
    nj_ref,
    a_ref,    # (TILE_P, TILE_M) block of A aligned with zi rows
    alphas_ref,  # (1, n_alphas) SMEM
    c_ref,    # (TILE_P, TILE_M) output block, accumulated over j and kd
    d2_scratch,
    *,
    m: int,
    n_alphas: int,
    n_kd: int,
):
    i, j, kd = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, kd == 0))
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

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
        k = jnp.zeros_like(d2)
        for a_idx in range(n_alphas):
            k = k + jnp.exp(-alphas_ref[0, a_idx] * d2)
        rows = j * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cols = i * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        # zero the diagonal in-kernel: the unbiased statistic excludes
        # self-pairs, and the numerical diagonal of the streamed Gram is
        # NOT exactly n_alphas (the chunked dot's d2_ii has f32 residual),
        # so a constant host-side correction would bias the statistic —
        # excluding it here matches the dense path's actual-diagonal
        # subtraction exactly-by-construction
        valid = (rows < m) & (cols < m) & (rows != cols)
        k = jnp.where(valid, k, 0.0)
        # C[:, i-cols] += A[:, j-rows] @ K[j-rows, i-cols]
        c_ref[:] += jnp.dot(a_ref[:], k, preferred_element_type=jnp.float32)


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
    """C = A @ K(z) without materializing K. Shapes padded to tiles."""
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
        out_specs=pl.BlockSpec((P, TILE_M), lambda i, j, kd: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, M), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_M), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * M * D + 2 * M * M * P,
            bytes_accessed=(M // TILE_M) * (2 * M * D + M * P) * 4,
            transcendentals=M * M * n_alphas,
        ),
        interpret=interpret,
    )(z_pad, z_pad, norms_pad, norms_pad, a_pad,
      alphas.reshape(1, -1).astype(jnp.float32))


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
) -> jax.Array:
    """Unbiased two-sample MMD statistics for a block of indicator rows.

    ``a_rows`` is (n_rows, M) with the indicator in the first ``m`` columns
    (zero-padded); rows are independent (C = A @ K row-wise), which is what
    makes the permutation axis embarrassingly parallel. Rows are processed
    in TILE_P-sized chunks (the kernel's A/C blocks live whole in VMEM), an
    all-ones row appended per chunk for the pooled total. All-zero caller
    padding rows yield garbage statistics the caller drops.
    """
    n_rows, M = a_rows.shape
    ones_row = jnp.zeros((1, M), jnp.float32).at[0, :m].set(1.0)

    # chunk the permutation axis: the kernel holds its whole A/C block in
    # VMEM (a (P, TILE_M) pair), so P must be bounded — TILE_P rows per
    # kernel call keeps the blocks ~0.5 MB each while amortizing the
    # distance stream over TILE_P permutations
    stats_chunks = []
    total = None
    for start in range(0, n_rows, TILE_P):
        block = a_rows[start : start + TILE_P]
        n_blk = block.shape[0]
        stacked = jnp.concatenate([block, ones_row], axis=0)
        P = _round_up(stacked.shape[0], 8)
        a_pad = (
            jnp.zeros((P, M), jnp.float32).at[: stacked.shape[0]].set(stacked)
        )
        c = _a_times_k(
            z_pad, norms, a_pad, alphas_arr, m,
            n_alphas=int(alphas_arr.shape[0]), tile_d=tile_d,
            interpret=interpret,
        )
        if total is None:
            total = jnp.sum(c[n_blk, :m])  # 1 K_offdiag 1^T (ones row)
        a = a_pad[:n_blk, :m]
        cb = c[:n_blk, :m]
        b = 1.0 - a
        # the kernel zeroes the Gram diagonal, so C and the pooled total
        # are diagonal-free already — no host-side correction
        s_xx = jnp.sum(cb * a, axis=1)
        s_xy = jnp.sum(cb * b, axis=1)
        s_yy = total - s_xx - 2.0 * s_xy
        stats_chunks.append(
            s_xx / (n1 * (n1 - 1))
            + s_yy / (n2 * (n2 - 1))
            - 2.0 * s_xy / (n1 * n2)
        )
    return jnp.concatenate(stats_chunks, axis=0)


def mmd_permutation_test_tiled(
    x: jax.Array,
    y: jax.Array,
    alphas,
    key: jax.Array,
    n_permutations: int = 1000,
    interpret: bool = None,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """Large-m counterpart of ``mmd_permutation_test`` (f32, streaming K).

    Same statistic and permutation semantics as ops.mmd_test._test_impl,
    but the pooled Gram never materializes: peak memory is O(P m) for the
    indicator rows. Use for screening at sample counts where the dense
    path's m^2 buffer cannot exist; the float64 host path remains the
    precision reference for null-regime p-values.

    With ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis) the
    permutation rows shard over devices — each device streams C = A_loc @ K
    for its local rows against replicated z (SURVEY.md section 2b: the GoF
    test's parallel axis; no collectives until the host gather of the (P,)
    statistics). Scaling note: the A@K term (2 m^2 P_loc flops) shards, but
    every device still recomputes the full distance/kernel stream
    (2 m^2 d flops + m^2 n_alphas exps), so near-linear speedup requires
    the permutation count to dominate (P >> d) — the regime of bootstrap
    p-values at P in the hundreds-to-thousands with moderate d.
    """
    import numpy as np

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
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
    perm_keys = jax.random.split(key, n_permutations)
    perms = jax.vmap(lambda kk: jax.random.permutation(kk, base))(perm_keys)
    # rows: [observed, permutations...]; padded to M columns
    a_rows = jnp.concatenate([base[None, :], perms], axis=0)
    n_rows = a_rows.shape[0]
    a_rows = jnp.zeros((n_rows, M), jnp.float32).at[:, :m].set(a_rows)

    alphas_arr = jnp.asarray([float(a) for a in np.asarray(alphas).ravel()])

    if mesh is None:
        stats = _stats_for_rows(
            a_rows, z_pad, norms, alphas_arr, n1, n2, m, tile_d, interpret
        )
    else:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape["data"]
        pad = (-n_rows) % n_dev
        a_sh = jnp.concatenate(
            [a_rows, jnp.zeros((pad, M), jnp.float32)], axis=0
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
            out_specs=PartitionSpec("data"),
            check_vma=False,
        )
        repl = NamedSharding(mesh, PartitionSpec())
        stats = fn(
            jax.device_put(a_sh, NamedSharding(mesh, PartitionSpec("data", None))),
            jax.device_put(z_pad, repl),
            jax.device_put(norms, repl),
        )[:n_rows]

    observed = stats[0]
    pval = jnp.mean((stats[1:] >= observed).astype(jnp.float32))
    return observed, pval
