"""Capture a Perfetto/xprof trace of a training run.

Wraps the whole-fit program in vgan_tpu's trace context; inspect the
resulting directory with xprof or ui.perfetto.dev.

Run: python examples/profile_fit.py --out /tmp/vgan_trace
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

from vgan_tpu import VGAN_no_kl
from vgan_tpu.data import correlated_gaussian
from vgan_tpu.utils.profiling import trace_context


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vgan_trace")
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    x = correlated_gaussian(n=2000, d=10, seed=0)
    model = VGAN_no_kl(epochs=args.epochs, verbose=False)
    model.fit(x)  # warm-up: compile outside the trace

    model2 = VGAN_no_kl(epochs=args.epochs, verbose=False)
    with trace_context(args.out):
        model2.fit(x)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
