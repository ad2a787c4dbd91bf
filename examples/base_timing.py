"""Per-base ensemble scoring cost on the chip — one line per base family.

Times ``SubspaceEnsemble.decision_function`` end to end (API level,
includes the one-dispatch fused path where it applies) at the bench shape:
1024 masks, 1000 train x 500 test, d=100. Feeds the per-base cost table in
docs/SCALING.md.

Run: python examples/base_timing.py [--masks 1024] [--repeat 3]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np

from vgan_tpu.cli import _SCORE_BASES
from vgan_tpu.ensemble import SubspaceEnsemble


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks", type=int, default=1024)
    ap.add_argument("--ntr", type=int, default=1000)
    ap.add_argument("--nt", type=int, default=500)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--bases", default=",".join(_SCORE_BASES))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    xtr = rng.normal(size=(args.ntr, args.d)).astype(np.float32)
    xte = rng.normal(size=(args.nt, args.d)).astype(np.float32)
    masks = rng.random(size=(args.masks, args.d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(args.masks, 1.0 / args.masks, np.float32)

    for base in args.bases.split(","):
        ens = SubspaceEnsemble(masks, proba, base=base).fit(xtr)
        s = ens.decision_function(xte)  # compile + warm caches
        assert np.all(np.isfinite(s)), base
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            s = ens.decision_function(xte)
            float(np.asarray(s)[0])  # value fetch = real barrier on axon
            best = min(best, time.perf_counter() - t0)
        per_mask_us = best / args.masks * 1e6
        print(f"{base:12s} {best * 1e3:9.1f} ms  "
              f"{per_mask_us:8.1f} us/mask  "
              f"{args.masks / best:10.0f} subspace-scorings/s", flush=True)


if __name__ == "__main__":
    main()
