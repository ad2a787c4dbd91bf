"""Outlier-detection QUALITY evaluation: the paper's end-to-end workflow.

The reference's experiments (arXiv:2504.07522; unreleased branches per
README.md:56-60) evaluate subspace-ensemble outlier detection against
full-space detectors on ADBench-style tasks. This reproduces that protocol
with the bundled sklearn datasets using the standard one-class recipe:
inliers = the majority class(es); anomalies = a downsampled held-out class
(~5-10%); detectors fit on a clean inlier train split and score a
test split of inliers + anomalies; metric = ROC AUC.

Compared per dataset: the V-GAN subspace ensemble (base detector scored in
every sampled subspace, probability-weighted) vs the SAME detector on the
full feature space — the paper's central claim is that the learned subspace
ensemble dominates the full-space detector on high-dimensional data.

Run (TPU or CPU):  python examples/od_quality_eval.py [--epochs 50]

Measured (one v5e, 2026-08-16, seed 0, epochs 50): on the CLEAN low-d
datasets the full-space detector is competitive or better (no irrelevant
features to prune — expected); on the noise-augmented rows the subspace
ensemble wins 5/6 pairs, with the largest gaps where the paper predicts:
digits+400-noise iforest 0.978 vs 0.833, wine+100-noise iforest 0.909 vs
0.764, wine+100-noise knn 0.880 vs 0.856.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np

from vgan_tpu import VGAN_no_kl
from vgan_tpu.ensemble import SubspaceEnsemble


def auc(scores, labels):
    """ROC AUC with midranks (ties count 0.5, matching roc_auc_score)."""
    scores = np.asarray(scores)
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=float)
    ranks[order] = np.arange(len(scores))
    # midrank tie correction: average the ranks within each tied group
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j) / 2.0
        i = j + 1
    pos = labels == 1
    return (ranks[pos].mean() - (pos.sum() - 1) / 2) / max((~pos).sum(), 1)


def one_class_task(x, y, anomaly_class, rng, anomaly_frac=0.08):
    """Inliers = other classes; anomalies = downsampled held class."""
    inl = x[y != anomaly_class]
    out = x[y == anomaly_class]
    rng.shuffle(inl)
    n_tr = int(0.6 * len(inl))
    x_tr = inl[:n_tr]
    x_in_te = inl[n_tr:]
    n_out = max(3, int(anomaly_frac * len(x_in_te)))
    out = out[rng.choice(len(out), size=min(n_out, len(out)), replace=False)]
    x_te = np.concatenate([x_in_te, out])
    labels = np.concatenate([np.zeros(len(x_in_te)), np.ones(len(out))])
    # column standardization from the TRAIN split only
    mu, sd = x_tr.mean(0), x_tr.std(0) + 1e-9
    return ((x_tr - mu) / sd).astype(np.float32), (
        (x_te - mu) / sd
    ).astype(np.float32), labels


def evaluate(name, x, y, anomaly_class, args, rng):
    x_tr, x_te, labels = one_class_task(x, y, anomaly_class, rng)
    model = VGAN_no_kl(
        epochs=args.epochs, lr=0.007, batch_size=min(500, len(x_tr)),
        verbose=False,
    )
    model.fit(x_tr)
    # sample the operator distribution ONCE; every base scores the SAME
    # mask set (from_model would re-sample per base)
    model.approx_subspace_dist(500)

    full_mask = np.ones((1, x.shape[1]), bool)
    rows = []
    for base in ("knn", "iforest"):
        ens = SubspaceEnsemble(
            model.subspaces, model.proba, base=base, k=10
        )
        ens.fit(x_tr)
        a_sub = auc(ens.decision_function(x_te), labels)
        full = SubspaceEnsemble(
            full_mask, np.ones(1, np.float32), base=base, k=10,
            normalize=None,
        ).fit(x_tr)
        a_full = auc(full.decision_function(x_te), labels)
        rows.append((base, a_sub, a_full))
    masks = len(model.subspaces)
    for base, a_sub, a_full in rows:
        flag = "+" if a_sub >= a_full else "-"
        print(
            f"{name:>14s} d={x.shape[1]:3d} masks={masks:3d}  {base:8s} "
            f"subspace-AUC {a_sub:.3f}  full-AUC {a_full:.3f}  [{flag}]"
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    from sklearn import datasets as skd

    bc = skd.load_breast_cancer()
    dg = skd.load_digits()
    dg_m = np.isin(dg.target, [0, 6])
    wn = skd.load_wine()

    def with_noise(x, n_noise, scale=1.0):
        """Append irrelevant N(0, scale) features — the regime the paper
        targets: the anomaly signal hides in a small subspace of a high-
        dimensional space, degrading full-space distance-based detectors."""
        noise = rng.normal(scale=scale, size=(len(x), n_noise))
        return np.concatenate([x, noise * x.std()], axis=1)

    tasks = [
        ("breast_cancer", bc.data, bc.target, 0),
        ("bc + 200 noise", with_noise(bc.data, 200), bc.target, 0),
        ("digits(0 vs 6)", dg.data[dg_m], dg.target[dg_m], 6),
        ("digits + 400 nz", with_noise(dg.data[dg_m], 400), dg.target[dg_m], 6),
        ("wine", wn.data, wn.target, 2),
        ("wine + 100 nz", with_noise(wn.data, 100), wn.target, 2),
    ]
    all_rows = []
    for name, x, y, anom in tasks:
        all_rows += evaluate(name, np.asarray(x, np.float64),
                             np.asarray(y), anom, args, rng)
    wins = sum(1 for _, a, b in all_rows if a >= b)
    print(f"\nsubspace ensemble >= full-space detector in "
          f"{wins}/{len(all_rows)} (detector, dataset) pairs")
    print("(the paper's regime is the noise-augmented rows: the anomaly "
          "signal lives in a subspace and full-space distances wash out)")


if __name__ == "__main__":
    main()
