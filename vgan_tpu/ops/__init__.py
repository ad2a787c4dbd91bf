"""Math kernels: subspace activations, multi-bandwidth RBF MMD, GoF test."""

from vgan_tpu.ops.activations import (
    upper_softmax,
    upper_lower_softmax,
    gumbel_upper_softmax,
    binarize_mask,
)
from vgan_tpu.ops.mmd import (
    bandwidth_multipliers,
    pairwise_sq_dists,
    candidate_bandwidth,
    reference_bandwidth,
    multi_rbf_gram,
    mmd2_biased,
    coverage_penalty,
    mmd_loss_constrained,
)
from vgan_tpu.ops.mmd_test import mmd_permutation_test

__all__ = [
    "upper_softmax",
    "upper_lower_softmax",
    "gumbel_upper_softmax",
    "binarize_mask",
    "bandwidth_multipliers",
    "pairwise_sq_dists",
    "candidate_bandwidth",
    "reference_bandwidth",
    "multi_rbf_gram",
    "mmd2_biased",
    "coverage_penalty",
    "mmd_loss_constrained",
    "mmd_permutation_test",
]
