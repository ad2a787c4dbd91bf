"""Multi-host input pipeline: build mesh-sharded global arrays from
per-process data.

Single-host: a plain ``device_put`` with the mesh sharding. Multi-host
(after ``jax.distributed.initialize``): each process loads only its row
shard (e.g. via the native CSV engine on its slice of files) and
``jax.make_array_from_process_local_data`` assembles the global array —
batches never transit DCN; only the Gram's ring exchange rides ICI
(SURVEY.md section 7, hard part 6).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def shard_dataset(
    x_local: np.ndarray,
    mesh: Mesh,
    shard_features: bool = False,
    n_total: int | None = None,
) -> jax.Array:
    """Assemble the global, mesh-sharded dataset from process-local rows.

    ``x_local`` is this process's row block (the full array on single-host).
    Rows shard over 'data'; features optionally over 'model'.

    Multi-host: pass ``n_total`` (the GLOBAL row count) so the global shape
    is explicit rather than inferred from the local block. CONSTRAINT
    (EXECUTED by tests/test_distributed.py on a real 2-process run):
    ``NamedSharding`` requires the global row count to divide evenly by the
    'data'-axis device count — a ragged split raises a shard-shape
    ValueError at assembly, so loaders must pad or drop rows to a device
    multiple upstream; ``process_row_range``'s ceil split then gives every
    process the same row count.
    """
    x_local = np.asarray(x_local)
    spec = PartitionSpec("data", "model" if shard_features else None)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x_local, sharding)
    if n_total is None:
        return jax.make_array_from_process_local_data(sharding, x_local)
    return jax.make_array_from_process_local_data(
        sharding, x_local, global_shape=(n_total,) + x_local.shape[1:]
    )


def process_row_range(n_total: int) -> tuple[int, int]:
    """[start, end) row range this process should load (contiguous split).

    The split is a ceil division. Note :func:`shard_dataset`'s constraint:
    the global row count must divide evenly by the mesh's 'data'-axis
    device count, so pad/drop ``n_total`` to a device multiple before
    splitting (then every process loads the same count).
    """
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n_total // p)
    return i * per, min((i + 1) * per, n_total)
