"""Subspace-ensemble outlier detection over V-GAN-sampled projections."""

from vgan_tpu.ensemble.od import (
    SubspaceEnsemble,
    knn_scores_masked,
    lof_scores_masked,
    mean_dist_scores_masked,
)

__all__ = [
    "SubspaceEnsemble",
    "knn_scores_masked",
    "lof_scores_masked",
    "mean_dist_scores_masked",
]
