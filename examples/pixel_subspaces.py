"""Image-as-features run (BASELINE config #3): learn axis-parallel PIXEL
subspaces on image data and visualize the learned masks as image grids.

Uses sklearn's bundled 8x8 digits (no network access); swap in MNIST pixels
by passing any (n, h*w) array. The learned masks reveal which pixel groups
move together distributionally.

Run: python examples/pixel_subspaces.py [--epochs 50] [--out masks.png]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np

from vgan_tpu import VGAN_no_kl
from vgan_tpu.data import sklearn_dataset


def visualize_masks(subspaces, proba, shape, out_path, max_masks=16):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    order = np.argsort(-proba)[:max_masks]
    cols = 4
    rows = -(-len(order) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.4 * rows))
    for ax in np.ravel(axes):
        ax.axis("off")
    for ax, idx in zip(np.ravel(axes), order):
        ax.imshow(subspaces[idx].reshape(shape), cmap="viridis", vmin=0, vmax=1)
        ax.set_title(f"p={proba[idx]:.3f}", fontsize=8)
        ax.axis("off")
    fig.suptitle("Learned axis-parallel pixel subspaces")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--out", default="pixel_masks.png")
    args = ap.parse_args()

    x, _ = sklearn_dataset("digits")  # (1797, 64) pixel features
    x = x / 16.0

    model = VGAN_no_kl(epochs=args.epochs, batch_size=500, verbose=False)
    model.fit(x)
    model.approx_subspace_dist(subspace_count=500)
    print(f"{len(model.subspaces)} unique pixel masks; "
          f"top probability {model.proba.max():.3f}")
    visualize_masks(model.subspaces, model.proba, (8, 8), args.out)


if __name__ == "__main__":
    main()
