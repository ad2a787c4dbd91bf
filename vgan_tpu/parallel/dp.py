"""Data-parallel whole-fit programs via GSPMD sharding.

The single-program fits (:mod:`vgan_tpu.train.steps`) are pure SPMD-friendly
XLA programs; scaling them over a mesh is a matter of placement: the dataset
shards over ('data', 'model') (rows x features), train state stays
replicated, and XLA GSPMD partitions the Gram matmuls / MLP layers and
inserts the ICI collectives. This is the default multi-chip path; the
explicit ring/shard_map path (:mod:`vgan_tpu.parallel.ring`) covers the
huge-n regime where the automatic partitioner's all-gather of the sample
set would not fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vgan_tpu.train.steps import (
    TrainConfig,
    kl_fit_program,
    no_kl_fit_program,
)


def _shard_x(x, mesh: Mesh, shard_features: bool) -> jax.Array:
    """Place x on the mesh. Accepts numpy or jax arrays; numpy goes straight
    through device_put (no eager jnp.asarray, which would land on the
    process default device — possibly a different backend than the mesh)."""
    spec = PartitionSpec("data", "model" if shard_features else None)
    if not isinstance(x, jax.Array):
        import numpy as np

        x = np.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, spec))


def no_kl_fit_program_dp(
    x: jax.Array,
    key: jax.Array,
    config: TrainConfig,
    epochs: int,
    mesh: Mesh,
    shard_features: bool = False,
):
    """Data-parallel no-kl fit: same program, mesh-sharded dataset.

    Returns ``(final_state, per_epoch_losses)`` — state replicated, losses
    fully addressable. Row shards ride the 'data' axis; with
    ``shard_features`` the feature axis additionally shards over 'model'
    (useful for d >= 10k).
    """
    xs = _shard_x(x, mesh, shard_features)
    return no_kl_fit_program(xs, key, config, epochs)


def kl_fit_program_dp(
    x: jax.Array,
    key: jax.Array,
    phases: jax.Array,
    config: TrainConfig,
    mesh: Mesh,
    shard_features: bool = False,
):
    """Data-parallel kl fit (generator vs detector) over a mesh."""
    xs = _shard_x(x, mesh, shard_features)
    return kl_fit_program(xs, key, jnp.asarray(phases), config)
