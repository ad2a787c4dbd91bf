"""Tabular sweep (BASELINE config #2 analogue): fit V-GAN across bundled
datasets of varying dimensionality and report loss, mask-support size, and
the myopicity GoF p-values. Stand-in for the reference's ADBench sweep
(its experiment branches are unreleased; no network access here).

Run: python examples/sweep.py [--epochs 30] [--variant no_kl]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import time

import numpy as np

from vgan_tpu import VGAN, VGAN_no_kl
from vgan_tpu.data import correlated_gaussian, sklearn_dataset


def run_one(name, x, variant, epochs):
    t0 = time.time()
    if variant == "kl":
        model = VGAN(epochs=epochs, verbose=False)
    else:
        model = VGAN_no_kl(epochs=epochs, verbose=False)
    model.fit(x)
    fit_s = time.time() - t0
    model.approx_subspace_dist(500)
    count = min(500, x.shape[0])
    pvals = model.check_if_myopic(x, count=count, n_permutations=200)
    loss_key = "generator_loss"
    print(
        f"{name:>14s}  n={x.shape[0]:5d} d={x.shape[1]:4d}  "
        f"fit {fit_s:6.1f}s  loss {model.train_history[loss_key][-1]:8.3f}  "
        f"masks {len(model.subspaces):4d}  top-p {model.proba.max():.3f}  "
        f"p(rec) {float(pvals['recommended bandwidth'].iloc[0]):.3f}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--variant", choices=["kl", "no_kl"], default="no_kl")
    args = ap.parse_args()

    datasets = []
    for name in ("iris", "wine", "breast_cancer", "digits"):
        x, _ = sklearn_dataset(name)
        datasets.append((name, x))
    datasets.append(("synth-d100", correlated_gaussian(n=2000, d=100, seed=0)))
    datasets.append(("synth-d1000", correlated_gaussian(n=2000, d=1000, seed=0)))

    for name, x in datasets:
        run_one(name, x, args.variant, args.epochs)


if __name__ == "__main__":
    main()
