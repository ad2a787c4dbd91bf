"""Fused, block-tiled Pallas TPU kernel for the multi-bandwidth RBF MMD.

Replaces the reference's materialize-everything pipeline
(``torch.cdist(Z, Z) ** 2`` -> 5 stacked exps -> quadrant means,
/root/reference/src/models/Mmd_loss_constrained.py:24-49) with one streaming
kernel: for each (row-tile i, col-tile j) of the implicit (m x m) Gram, the
squared distances are accumulated over d-chunks on the MXU
(``|zi|^2 + |zj|^2 - 2 zi . zj``), the 5-bandwidth exp-sum is applied on the
VPU, and the three quadrant sums (XX, XY, YY) are reduced into SMEM scalars.
The m x m kernel matrix never exists in HBM; the d-axis is chunked so
d >= 10k streams through VMEM (the framework's "long-context" analogue,
SURVEY.md section 5).

Backward (custom VJP): with S = (C + C^T)/2 .* K'(D2) (C the quadrant
coefficient matrix of the biased MMD, K' the kernel derivative wrt squared
distance), the input cotangent is ``dz = 4 g (rowsum(S) * z - S @ z)``. The
forward stores the (m x m) D2 matrix as a residual (f32; ~4 MB at the
reference's batch size, capped by `pallas_supported`), and the backward
kernel streams S tiles out of it — recompute-light, still never
materializing S.

No gradient flows through the bandwidth (the reference detaches it,
Mmd_loss_constrained.py:19-20) nor through the selection masks.

The candidate (data-driven) bandwidth uses the closed form
``sum_ij d2_ij = 2 m sum_i |z_i|^2 - 2 |sum_i z_i|^2`` — O(md) instead of
O(m^2 d). Divergence note: the torch path clamps each d2 at 0 before
summing; the closed form does not, so the two can differ by ~1e-6 relative
when near-duplicate rows produce tiny negative fp residuals.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgan_tpu.ops import mmd as _mmd

# Row/col tile and d-chunk sizes. f32 min tile is (8, 128); these are
# MXU-friendly multiples chosen so VMEM stays ~2-3 MB with double buffering.
TILE_M = 256
TILE_D = 512

# Residual D2 matrix is f32 (m x m); cap m so the residual stays <= 1 GiB.
MAX_M_FOR_PALLAS = 16384


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def pallas_supported(x: jax.Array, y: jax.Array) -> bool:
    """True when the fused TPU kernel should handle these operands.

    Besides the platform/shape gates, this is a performance dispatch: the
    kernel pads d up to TILE_D and m up to TILE_M, so for small problems the
    padding waste loses to XLA's fused jnp path (measured crossover: the
    kernel wins once the feature axis is at least a tile or the sample count
    makes materializing the m^2 Gram traffic-bound).
    """
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - backend probing must never fail
        return False
    if platform not in ("tpu", "axon"):
        return False
    if x.ndim != 2 or y.ndim != 2:
        return False
    m = x.shape[0] + y.shape[0]
    d = x.shape[1]
    if m > MAX_M_FOR_PALLAS:
        return False
    return d >= TILE_D or m >= 4096


# ---------------------------------------------------------------------------
# forward kernel: quadrant sums (+ D2 residual)
# ---------------------------------------------------------------------------


def _fwd_kernel(
    zi_ref,
    zj_ref,
    ni_ref,
    nj_ref,
    bw_ref,
    sums_ref,
    d2_out_ref,
    d2_scratch,
    *,
    n1: int,
    m: int,
    mults: Tuple[float, ...],
    n_kd: int,
):
    i, j, kd = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(jnp.logical_and(i == 0, j == 0), kd == 0))
    def _():
        sums_ref[0, 0] = 0.0
        sums_ref[0, 1] = 0.0
        sums_ref[0, 2] = 0.0
        sums_ref[0, 3] = 0.0

    @pl.when(kd == 0)
    def _():
        d2_scratch[:] = jnp.zeros_like(d2_scratch)

    # Accumulate the -2 zi . zj partial dot for this d-chunk on the MXU.
    d2_scratch[:] += -2.0 * jnp.dot(
        zi_ref[:], zj_ref[:].T, preferred_element_type=jnp.float32
    )

    @pl.when(kd == n_kd - 1)
    def _():
        d2 = jnp.maximum(d2_scratch[:] + ni_ref[:] + nj_ref[:].T, 0.0)
        d2_out_ref[:] = d2

        bw = bw_ref[0, 0]
        ladder = _mmd.ladder_exponents(mults)
        if ladder is not None:
            base, ints = ladder
            t = jnp.exp(-d2 / (bw * base))
            k = jnp.zeros_like(d2)
            for pw in _mmd.integer_powers(t, ints):
                k = k + pw
        else:
            k = jnp.zeros_like(d2)
            for mk in mults:
                k = k + jnp.exp(-d2 / (bw * mk))

        rows = i * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cols = j * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        row_x = rows < n1
        col_x = cols < n1
        row_ok = rows < m
        col_ok = cols < m
        valid = jnp.logical_and(row_ok, col_ok)

        kf = jnp.where(valid, k, 0.0)
        xx = jnp.sum(jnp.where(jnp.logical_and(row_x, col_x), kf, 0.0))
        xy = jnp.sum(
            jnp.where(jnp.logical_and(row_x, jnp.logical_not(col_x)), kf, 0.0)
        )
        yy = jnp.sum(
            jnp.where(
                jnp.logical_and(jnp.logical_not(row_x), jnp.logical_not(col_x)),
                kf,
                0.0,
            )
        )
        sums_ref[0, 0] += xx
        sums_ref[0, 1] += xy
        sums_ref[0, 2] += yy


@functools.partial(
    jax.jit, static_argnames=("n1", "m", "mults", "interpret")
)
def _gram_quadrant_sums(
    z_pad: jax.Array,
    norms_pad: jax.Array,
    bw: jax.Array,
    n1: int,
    m: int,
    mults: Tuple[float, ...],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(sums (1, 4), d2 (M, M))`` for padded inputs."""
    M, D = z_pad.shape
    grid = (M // TILE_M, M // TILE_M, D // TILE_D)
    n_kd = D // TILE_D
    kernel = functools.partial(
        _fwd_kernel, n1=n1, m=m, mults=mults, n_kd=n_kd
    )
    flops = 2 * M * M * D + 8 * M * M * len(mults)
    sums, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_D), lambda i, j, kd: (i, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, TILE_D), lambda i, j, kd: (j, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j, kd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j, kd: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, kd: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4), lambda i, j, kd: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_M, TILE_M), lambda i, j, kd: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_M), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * M * D * 4 + M * M * 4,
            transcendentals=M * M * len(mults),
        ),
        interpret=interpret,
    )(z_pad, z_pad, norms_pad, norms_pad, bw.reshape(1, 1).astype(jnp.float32))
    return sums, d2


# ---------------------------------------------------------------------------
# backward kernel: rowsum(S) and S @ z from the D2 residual
# ---------------------------------------------------------------------------


def _bwd_kernel(
    d2_ref,
    zj_ref,
    bw_ref,
    sz_ref,
    rs_ref,
    *,
    n1: int,
    n2: int,
    m: int,
    mults: Tuple[float, ...],
):
    i, kd, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    bw = bw_ref[0, 0]
    d2 = d2_ref[:]
    # K'(d2) = -sum_k exp(-d2/(bw mk)) / (bw mk); geometric ladders use the
    # single-exp integer-power form (see ops.mmd.ladder_exponents)
    ladder = _mmd.ladder_exponents(mults)
    kprime = jnp.zeros_like(d2)
    if ladder is not None:
        base, ints = ladder
        t = jnp.exp(-d2 / (bw * base))
        for mk, pw in zip(mults, _mmd.integer_powers(t, ints)):
            kprime = kprime - pw / (bw * mk)
    else:
        for mk in mults:
            kprime = kprime - jnp.exp(-d2 / (bw * mk)) / (bw * mk)

    rows = i * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    cols = j * TILE_M + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    row_x = rows < n1
    col_x = cols < n1
    valid = jnp.logical_and(rows < m, cols < m)

    # Symmetrized quadrant coefficients of the biased MMD:
    #   XX: 1/n1^2, YY: 1/n2^2, XY and YX: -1/(n1 n2).
    c_xx = 1.0 / (n1 * n1)
    c_yy = 1.0 / (n2 * n2)
    c_xy = -1.0 / (n1 * n2)
    coeff = jnp.where(
        jnp.logical_and(row_x, col_x),
        c_xx,
        jnp.where(jnp.logical_and(jnp.logical_not(row_x), jnp.logical_not(col_x)),
                  c_yy, c_xy),
    )
    s = jnp.where(valid, coeff * kprime, 0.0)

    @pl.when(j == 0)
    def _():
        sz_ref[:] = jnp.zeros_like(sz_ref)

    sz_ref[:] += jnp.dot(s, zj_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kd == 0)
    def _():
        @pl.when(j == 0)
        def _():
            rs_ref[:] = jnp.zeros_like(rs_ref)

        rs_ref[:] += jnp.sum(s, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "m", "mults", "interpret"))
def _gram_backward(
    d2: jax.Array,
    z_pad: jax.Array,
    bw: jax.Array,
    n1: int,
    n2: int,
    m: int,
    mults: Tuple[float, ...],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(sz (M, D), rs (M, 1))``."""
    M, D = z_pad.shape
    grid = (M // TILE_M, D // TILE_D, M // TILE_M)
    kernel = functools.partial(_bwd_kernel, n1=n1, n2=n2, m=m, mults=mults)
    sz, rs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_M), lambda i, kd, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, TILE_D), lambda i, kd, j: (j, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, kd, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_M, TILE_D), lambda i, kd, j: (i, kd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, kd, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * M * D + 10 * M * M * len(mults),
            bytes_accessed=M * M * 4 * (D // TILE_D) + 2 * M * D * 4,
            transcendentals=M * M * len(mults) * (D // TILE_D),
        ),
        interpret=interpret,
    )(d2, z_pad, bw.reshape(1, 1).astype(jnp.float32))
    return sz, rs


# ---------------------------------------------------------------------------
# custom-VJP wrapper and public entry points
# ---------------------------------------------------------------------------


def _closed_form_bandwidth(z: jax.Array, m: int) -> jax.Array:
    """O(md) candidate bandwidth: mean off-diagonal-denominator squared dist.

    sum_ij d2_ij = 2 m sum_i |z_i|^2 - 2 |sum_i z_i|^2, divided by m^2 - m
    (reference rule, Mmd_loss_constrained.py:19; clamp divergence in module
    docstring). Detached, matching the reference's ``.data``.
    """
    z = z.astype(jnp.float32)
    total = 2.0 * m * jnp.sum(z * z) - 2.0 * jnp.sum(jnp.sum(z, axis=0) ** 2)
    return jax.lax.stop_gradient(total / (m * m - m))


def _pad_z(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array, int, int, int]:
    n1, n2 = x.shape[0], y.shape[0]
    m = n1 + n2
    d = x.shape[1]
    M = _round_up(m, TILE_M)
    D = _round_up(d, TILE_D)
    z = jnp.concatenate([x, y], axis=0).astype(jnp.float32)
    z_pad = jnp.zeros((M, D), jnp.float32).at[:m, :d].set(z)
    norms = jnp.sum(z_pad * z_pad, axis=1, keepdims=True)
    return z_pad, norms, n1, n2, m


def _interpret_mode() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _mmd2_from_sums(sums: jax.Array, n1: int, n2: int) -> jax.Array:
    sxx = sums[0, 0]
    sxy = sums[0, 1]
    syy = sums[0, 2]
    return sxx / (n1 * n1) - 2.0 * sxy / (n1 * n2) + syy / (n2 * n2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mmd2_core(mults: Tuple[float, ...], n1: int, n2: int,
               x: jax.Array, y: jax.Array, bw: jax.Array) -> jax.Array:
    z_pad, norms, _, _, m = _pad_z(x, y)
    sums, _ = _gram_quadrant_sums(
        z_pad, norms, bw, n1, m, mults, interpret=_interpret_mode()
    )
    return _mmd2_from_sums(sums, n1, n2)


def _mmd2_fwd(mults, n1, n2, x, y, bw):
    z_pad, norms, _, _, m = _pad_z(x, y)
    sums, d2 = _gram_quadrant_sums(
        z_pad, norms, bw, n1, m, mults, interpret=_interpret_mode()
    )
    mmd2 = _mmd2_from_sums(sums, n1, n2)
    # zero-size carriers keep the primal dtypes for the cotangents
    x_proto = jnp.zeros((0, x.shape[1]), x.dtype)
    y_proto = jnp.zeros((0, y.shape[1]), y.dtype)
    return mmd2, (z_pad, d2, bw, x_proto, y_proto)


def _mmd2_bwd(mults, n1, n2, res, g):
    z_pad, d2, bw, x_proto, y_proto = res
    m = n1 + n2
    sz, rs = _gram_backward(
        d2, z_pad, bw, n1, n2, m, mults, interpret=_interpret_mode()
    )
    # dz_p = 2 g sum_j (C + C^T)_pj K'_pj (z_p - z_j) = 4 g sum_j S_pj (z_p - z_j)
    # with S = C_sym .* K' (the kernel computes S with the symmetrized C).
    dz = 4.0 * g * (rs * z_pad - sz)
    dx = dz[:n1, : x_proto.shape[1]].astype(x_proto.dtype)
    dy = dz[n1:m, : y_proto.shape[1]].astype(y_proto.dtype)
    return dx, dy, jnp.zeros_like(bw)


_mmd2_core.defvjp(_mmd2_fwd, _mmd2_bwd)


def mmd2_pallas_core(x: jax.Array, y: jax.Array, bw: jax.Array,
                     mults: Tuple[float, ...]) -> jax.Array:
    """Biased MMD^2 via the fused kernel, given a resolved bandwidth."""
    return _mmd2_core(mults, x.shape[0], y.shape[0], x, y, bw)


def mmd2_biased_pallas(
    x: jax.Array,
    y: jax.Array,
    bandwidth: Optional[jax.Array] = None,
    mults: Tuple[float, ...] = _mmd.bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel counterpart of :func:`vgan_tpu.ops.mmd.mmd2_biased`."""
    m = x.shape[0] + y.shape[0]
    if bandwidth is None:
        z = jnp.concatenate([x, y], axis=0)
        bandwidth = _closed_form_bandwidth(z, m)
    bw = jnp.asarray(bandwidth, jnp.float32)
    return mmd2_pallas_core(x, y, bw, mults), bw


def mmd2_biased_stateful_pallas(
    x: jax.Array,
    y: jax.Array,
    bw_value: jax.Array,
    bw_is_set: jax.Array,
    mults: Tuple[float, ...] = _mmd.bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel counterpart of ``mmd2_biased_stateful``."""
    m = x.shape[0] + y.shape[0]
    z = jnp.concatenate([x, y], axis=0)
    candidate = _closed_form_bandwidth(z, m)
    bw = jnp.where(bw_is_set, bw_value, candidate).astype(jnp.float32)
    return mmd2_pallas_core(x, y, bw, mults), bw
