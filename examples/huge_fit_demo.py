"""Production-scale fit demo: batch_size=20480 at d=10240 — the regime the
round-2 cap excluded.

Each train step evaluates the constrained MMD over m = 2 * 20480 = 40,960
stacked rows at d=10,240 — fwd+bwd streams through the rank-1 K'-panel
backward (ops/pallas/mmd_gram.py) at ~145 TFLOP/s; no (m, m) buffer ever
exists. The reference implementation cannot express this step at all: its
``torch.cdist`` Gram would be a 6.7 GB f32 matrix per loss evaluation
(plus autograd residuals), and round 2's S-materializing backward capped
the fused path at m <= 16384 for d > 2048.

Uses the round-3 bf16 options (bf16 distance/model operands + bf16-stored
Adadelta EMAs) — the whole-fit program is ONE XLA scan.

Run on the chip:  python examples/huge_fit_demo.py [--steps 8]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--d", type=int, default=10240)
    ap.add_argument("--batch-size", type=int, default=20480)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vgan_tpu.train.steps import TrainConfig, no_kl_fit_program

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.n, args.d)).astype(np.float32))
    steps_per_epoch = args.n // args.batch_size
    epochs = max(1, args.steps // steps_per_epoch)

    config = TrainConfig(
        ndims=args.d,
        batch_size=args.batch_size,
        mmd_impl="auto",
        gram_matmul_dtype="bfloat16",
        model_matmul_dtype="bfloat16",
        opt_state_dtype="bfloat16",
    )
    t0 = time.time()
    state, losses = no_kl_fit_program(x, jax.random.PRNGKey(0), config, epochs)
    first = float(losses[-1])
    print(f"compile+first {epochs} epochs ({epochs * steps_per_epoch} steps): "
          f"{time.time() - t0:.1f}s  (loss {first:.4f})")

    t0 = time.time()
    state, losses = no_kl_fit_program(x, jax.random.PRNGKey(1), config, epochs)
    final = float(losses[-1])
    dt = time.time() - t0
    n_steps = epochs * steps_per_epoch
    gram_flops = 6.0 * (2 * args.batch_size) ** 2 * args.d
    print(
        f"steady: {n_steps} steps in {dt:.2f}s -> {dt / n_steps:.2f} s/step "
        f"({gram_flops / (dt / n_steps) / 1e12:.0f} TFLOP/s on the Gram "
        f"fwd+bwd alone; m={2 * args.batch_size} per loss eval, loss "
        f"{final:.4f})"
    )
    assert np.isfinite(final)
    print("HUGE-FIT OK")


if __name__ == "__main__":
    main()
