"""Subspace-ensemble outlier detection (BASELINE config #4): train V-GAN,
sample the operator distribution, score test points with a vmap-batched base
detector across all subspaces in one compiled program.

Run: python examples/ensemble_od.py
       [--base knn|knn_mean|lof|abod|cof|iforest|mahalanobis|cblof|gmm|
               loda|kde|inne|pca|sampling|kpca|mcd|ae|dsvdd|sod|copod|
               hbos|ecod]
       [--aggregation average|max|aom|moa]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np

from vgan_tpu import VGAN_no_kl
from vgan_tpu.cli import _SCORE_BASES  # the canonical native-base list
from vgan_tpu.data import correlated_gaussian
from vgan_tpu.ensemble import SubspaceEnsemble


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="knn", choices=sorted(_SCORE_BASES))
    ap.add_argument("--aggregation", default="average",
                    choices=["average", "max", "aom", "moa", "median"])
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    d = 20
    x_train = correlated_gaussian(n=1000, d=d, coupled=(0, 5, 6), seed=0)
    rng = np.random.default_rng(1)
    inliers = correlated_gaussian(n=180, d=d, coupled=(0, 5, 6), seed=2)
    outliers = rng.normal(size=(20, d))
    outliers[:, :5] += 5.0
    x_test = np.vstack([inliers, outliers])
    y_true = np.r_[np.zeros(180), np.ones(20)]

    model = VGAN_no_kl(epochs=args.epochs, batch_size=250, verbose=False)
    model.fit(x_train)

    ens = SubspaceEnsemble.from_model(
        model, subspace_count=1000, base=args.base, k=15,
        aggregation=args.aggregation,
    ).fit(x_train)
    scores = ens.decision_function(x_test)
    labels = ens.predict(x_test)  # pyod-style contamination thresholding

    order = np.argsort(-scores)
    top20 = set(order[:20])
    hits = len(top20 & set(np.where(y_true == 1)[0]))
    print(f"{len(ens.subspaces)} unique subspaces; base={args.base}; "
          f"aggregation={args.aggregation}")
    print(f"precision@20: {hits / 20:.2f}")
    print(f"predict: {int(labels.sum())} flagged at threshold "
          f"{ens.threshold_:.3f} (contamination={ens.contamination})")

    # suod-style heterogeneous combination: three base families over the
    # SAME subspace pool, member scores standardized then averaged
    from vgan_tpu.ensemble import HeterogeneousEnsemble

    het = HeterogeneousEnsemble.from_model(
        model, subspace_count=1000, combination="select",
        members=[{"base": "knn", "k": 15}, {"base": "lof", "k": 15},
                 {"base": "ecod"}],
    ).fit(x_train)
    h_scores = het.decision_function(x_test)
    h_order = np.argsort(-h_scores)
    h_hits = len(set(h_order[:20]) & set(np.where(y_true == 1)[0]))
    print(f"heterogeneous (knn+lof+ecod, 'select') precision@20: "
          f"{h_hits / 20:.2f}; member weights {het.member_weights_}")

    # learned-vs-random: the paper's feature-bagging baseline on the same
    # base detector
    from vgan_tpu.ensemble import random_subspaces

    fb_masks, fb_proba = random_subspaces(d, 100, seed=3)
    fb = SubspaceEnsemble(
        fb_masks, fb_proba, base=args.base, k=15,
        aggregation=args.aggregation,
    ).fit(x_train)
    fb_scores = fb.decision_function(x_test)
    fb_hits = len(
        set(np.argsort(-fb_scores)[:20]) & set(np.where(y_true == 1)[0])
    )
    print(f"random feature bagging precision@20: {fb_hits / 20:.2f} "
          "(vs learned above)")


if __name__ == "__main__":
    main()
