"""Multi-chip scaling: device meshes, sharded fits, ring/feature-sharded MMD.

The reference is strictly single-device (/root/reference/src/vgan.py:46-47;
no torch.distributed anywhere). This package supplies the TPU-native
scaling axes the rebuild treats as first-class (SURVEY.md section 2b):

- **data parallel (dp)**: batch rows sharded over a ``Mesh('data')``; the
  whole-fit program runs under GSPMD with XLA inserting ICI collectives;
- **sample-parallel ring (the sequence-parallel analogue)**: the O(m^2 d)
  Gram over row-sharded samples computed by ring-``ppermute`` block
  exchange, so no device ever holds the full sample set — kernel-method
  ring attention (:mod:`vgan_tpu.parallel.ring`);
- **feature sharding (the tensor-parallel analogue)**: squared distances
  are additive over features, so a d-sharded batch needs one ``psum`` of
  partial d2 blocks (:func:`vgan_tpu.parallel.ring.mmd2_feature_sharded`);
  the generator's 8L x d output layer shards on the same axis.
"""

from vgan_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from vgan_tpu.parallel.ring import (
    ring_quadrant_sums,
    mmd2_ring_rowsharded,
    mmd2_feature_sharded,
)
from vgan_tpu.parallel.dp import no_kl_fit_program_dp, kl_fit_program_dp
from vgan_tpu.parallel.input import shard_dataset, process_row_range

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "ring_quadrant_sums",
    "mmd2_ring_rowsharded",
    "mmd2_feature_sharded",
    "no_kl_fit_program_dp",
    "kl_fit_program_dp",
    "shard_dataset",
    "process_row_range",
]
