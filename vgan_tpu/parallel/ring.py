"""Sharded MMD: ring-ppermute over row shards, psum over feature shards.

The reference materializes one (2n x 2n) Gram on one device
(Mmd_loss_constrained.py:24-26, 43-49). Here the same biased MMD^2 is
computed over *sharded* samples without any device holding the full sample
set or the full Gram:

- **row-sharded (ring)**: each device owns a row block (x_p, y_p). The
  quadrant sums decompose over block pairs; a P-step ring (``ppermute`` of
  the partner block around the 'data' axis) visits every (p, q) pair while
  only ever holding two blocks, and one ``psum`` assembles the global sums.
  This is the kernel-method analogue of ring attention: compute rides the
  MXU, the block exchange rides ICI, and JAX differentiates through the
  ``ppermute``/``psum`` chain so the same code serves training.
- **feature-sharded (tensor-parallel analogue)**: squared distances are
  additive over features, so d-sharded operands need exactly one ``psum``
  of the partial (m x m) distance matrix; the cheap exp/reduce epilogue is
  then computed redundantly per device.

Both return values identical (up to reduction order) to the single-device
:func:`vgan_tpu.ops.mmd.mmd2_biased_stateful` — verified by the 8-virtual-
device equivalence tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from vgan_tpu.ops.mmd import bandwidth_multipliers, multi_rbf_gram


def _block_gram_sum(
    a: jax.Array, b: jax.Array, bw: jax.Array, mults: Tuple[float, ...]
) -> jax.Array:
    """sum_ij K(a_i, b_j) for one block pair (multi-bandwidth RBF)."""
    an = jnp.sum(a * a, axis=-1)
    bn = jnp.sum(b * b, axis=-1)
    d2 = jnp.maximum(
        an[:, None] + bn[None, :]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=a.dtype),
        0.0,
    )
    return jnp.sum(multi_rbf_gram(d2, bw, mults))


def _global_candidate_bandwidth(
    x_loc: jax.Array, y_loc: jax.Array, axis_name: str
) -> jax.Array:
    """Sharded version of :func:`vgan_tpu.ops.mmd.candidate_bandwidth`.

    Same centered closed form (sum_ij d2_ij = 2 m sum_i |z_i - mean|^2,
    divided by m^2 - m; Mmd_loss_constrained.py:19; detached), with the mean
    and the centered square sum each psum-ed over row shards — so the frozen
    bandwidth matches the single-device rule up to reduction order.
    """
    z_loc = jnp.concatenate([x_loc, y_loc], axis=0)
    m = z_loc.shape[0] * lax.axis_size(axis_name)
    mean = lax.psum(jnp.sum(z_loc, axis=0), axis_name) / m
    zc = z_loc - mean
    sq = lax.psum(jnp.sum(zc * zc), axis_name)
    return lax.stop_gradient(2.0 * m * sq / (m * m - m))


def ring_quadrant_sums(
    x_loc: jax.Array,
    y_loc: jax.Array,
    bw: jax.Array,
    axis_name: str,
    mults: Tuple[float, ...] = bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Global (sum Kxx, sum Kxy, sum Kyy) over row-sharded samples.

    Must be called inside ``shard_map`` (or pmap) over ``axis_name`` with
    ``x_loc``/``y_loc`` the local row blocks. P-1 ppermute steps + 1 psum.
    """
    p = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]
    bx = x_loc.shape[0]

    # Design note (round-3 review of the rank-1 C_sym = q q^T identity from
    # the Pallas backward): folding the quadrants into one q-weighted
    # bilinear form over the stacked [x; y] block would touch 4 b^2 Gram
    # entries per pair vs the 3 b^2 of this 3-quadrant decomposition (yx is
    # covered by visiting all ordered pairs), so it is NOT adopted here.
    # The exp ladder already runs as ONE transcendental + integer powers
    # (multi_rbf_gram). What IS shared: the partner's x/y blocks ride a
    # single stacked ppermute — one ICI message per ring step, not two.
    def step(carry, _):
        # permute first, then accumulate: exactly p-1 exchanges for p blocks
        # (the local pair is accumulated before the scan)
        zb, sxx, sxy, syy = carry
        zb = lax.ppermute(zb, axis_name, perm)
        xb, yb = zb[:bx], zb[bx:]
        sxx = sxx + _block_gram_sum(x_loc, xb, bw, mults)
        sxy = sxy + _block_gram_sum(x_loc, yb, bw, mults)
        syy = syy + _block_gram_sum(y_loc, yb, bw, mults)
        return (zb, sxx, sxy, syy), None

    sxx0 = _block_gram_sum(x_loc, x_loc, bw, mults)
    sxy0 = _block_gram_sum(x_loc, y_loc, bw, mults)
    syy0 = _block_gram_sum(y_loc, y_loc, bw, mults)
    (_, sxx, sxy, syy), _ = lax.scan(
        step,
        (jnp.concatenate([x_loc, y_loc], axis=0), sxx0, sxy0, syy0),
        None,
        length=p - 1,
    )
    sxx = lax.psum(sxx, axis_name)
    sxy = lax.psum(sxy, axis_name)
    syy = lax.psum(syy, axis_name)
    return sxx, sxy, syy


def mmd2_ring_rowsharded(
    x_loc: jax.Array,
    y_loc: jax.Array,
    bw_value: jax.Array,
    bw_is_set: jax.Array,
    axis_name: str,
    mults: Tuple[float, ...] = bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded stateful biased MMD^2; same contract as the local op."""
    p = lax.axis_size(axis_name)
    n1 = x_loc.shape[0] * p
    n2 = y_loc.shape[0] * p
    candidate = _global_candidate_bandwidth(x_loc, y_loc, axis_name)
    bw = jnp.where(bw_is_set, bw_value, candidate).astype(x_loc.dtype)
    sxx, sxy, syy = ring_quadrant_sums(x_loc, y_loc, bw, axis_name, mults)
    mmd2 = sxx / (n1 * n1) - 2.0 * sxy / (n1 * n2) + syy / (n2 * n2)
    return mmd2, bw


def mmd_loss_ring_rowsharded(
    x_loc: jax.Array,
    y_loc: jax.Array,
    u_loc: jax.Array,
    weight: float,
    bw_value: jax.Array,
    bw_is_set: jax.Array,
    axis_name: str,
    mults: Tuple[float, ...] = bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded constrained MMD loss (+ global coverage penalty).

    The coverage penalty's column max runs over ALL generated masks, so the
    local column max is pmax-ed over the data axis (vgan parity:
    Mmd_loss_constrained.py:50 computes it over the whole batch).
    """
    mmd2, bw = mmd2_ring_rowsharded(
        x_loc, y_loc, bw_value, bw_is_set, axis_name, mults
    )
    # all_gather (differentiable) instead of pmax (no AD rule): the penalty
    # is part of the generator loss, so gradients must flow to the argmax.
    local_max = jnp.max(u_loc, axis=0)
    col_max = jnp.max(lax.all_gather(local_max, axis_name), axis=0)
    penalty = jnp.mean(1.0 - col_max)
    return mmd2 + weight * penalty, bw


def mmd2_feature_sharded(
    x_loc: jax.Array,
    y_loc: jax.Array,
    bw_value: jax.Array,
    bw_is_set: jax.Array,
    axis_name: str,
    mults: Tuple[float, ...] = bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    """Feature-sharded stateful biased MMD^2 (one psum of partial d2).

    ``x_loc``/``y_loc`` hold full rows but a feature slice; squared
    distances add over feature shards. Candidate bandwidth uses the shared
    centered closed form (ops.mmd.candidate_bandwidth) with the centered
    square sum psum-ed over feature shards.
    """
    n1, n2 = x_loc.shape[0], y_loc.shape[0]
    z = jnp.concatenate([x_loc, y_loc], axis=0)
    zn = jnp.sum(z * z, axis=-1)
    partial = (
        zn[:, None]
        + zn[None, :]
        - 2.0 * jnp.dot(z, z.T, preferred_element_type=z.dtype)
    )
    d2 = jnp.maximum(lax.psum(partial, axis_name), 0.0)
    m = n1 + n2
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    sq = lax.psum(jnp.sum(zc * zc), axis_name)
    candidate = lax.stop_gradient(2.0 * m * sq / (m * m - m))
    bw = jnp.where(bw_is_set, bw_value, candidate).astype(x_loc.dtype)
    k = multi_rbf_gram(d2, bw, mults)
    mmd2 = (
        jnp.mean(k[:n1, :n1])
        - 2.0 * jnp.mean(k[:n1, n1:])
        + jnp.mean(k[n1:, n1:])
    )
    return mmd2, bw
