"""End-to-end example mirroring the reference's demo notebook
(/root/reference/test.ipynb cells 2-14): train both estimator variants on a
correlated Gaussian, sample subspaces, approximate the operator
distribution, project data, and run the myopicity GoF test.

Run: python examples/demo.py [--epochs 15]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np
import pandas as pd

from vgan_tpu import VGAN, VGAN_no_kl
from vgan_tpu.data import notebook_gaussian


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args()

    X_data = notebook_gaussian(n=2000, d=10, seed=0)

    model = VGAN_no_kl(epochs=args.epochs, lr=0.001, verbose=False)
    model.fit(X_data)
    model_kl = VGAN(epochs=args.epochs, verbose=False)
    model_kl.fit(X_data)
    print("no-kl final loss:", model.train_history["generator_loss"][-1])
    print("kl final detector loss:", model_kl.train_history["detector_loss"][-1])

    u_1 = model_kl.generate_subspaces(10)
    u_2 = model.generate_subspaces(10)
    print((u_1[0], u_2[0]))

    print("one projected dataset:", X_data[:, u_1[0]].shape)

    model_kl.approx_subspace_dist()
    model.approx_subspace_dist()
    print("Distribution of the operator obtained by using VGAN with kl:")
    print(pd.DataFrame(model_kl.subspaces, model_kl.proba))
    print("\n Distribution of the operator obtained by using VGAN without kl:")
    print(pd.DataFrame(model.subspaces, model.proba))

    print(model.check_if_myopic(X_data))
    print(model_kl.check_if_myopic(X_data))


if __name__ == "__main__":
    main()
