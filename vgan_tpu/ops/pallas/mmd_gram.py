"""Fused, block-tiled MMD Gram kernel (placeholder dispatcher).

The real Pallas kernel lands in a follow-up milestone; until then this module
only exposes the dispatch predicate (always False) and a jnp passthrough so
``vgan_tpu.ops.mmd.mmd_loss_constrained(impl='auto')`` works everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from vgan_tpu.ops import mmd as _mmd


def pallas_supported(x: jax.Array, y: jax.Array) -> bool:
    return False


def mmd2_biased_pallas(
    x: jax.Array,
    y: jax.Array,
    bandwidth: Optional[jax.Array] = None,
    mults: Tuple[float, ...] = _mmd.bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    return _mmd.mmd2_biased(x, y, bandwidth=bandwidth, mults=mults)


def mmd2_biased_stateful_pallas(
    x: jax.Array,
    y: jax.Array,
    bw_value: jax.Array,
    bw_is_set: jax.Array,
    mults: Tuple[float, ...] = _mmd.bandwidth_multipliers(),
) -> Tuple[jax.Array, jax.Array]:
    return _mmd.mmd2_biased_stateful(x, y, bw_value, bw_is_set, mults, impl="jnp")
