"""Real-chip check: count=16384 precise GoF vs a blockwise numpy-f64 oracle.

Validates the round-3 uncapped precise path (Kahan-compensated C planes on
device + float64 host reduction, ops/pallas/gof_gram.py) at a sample count
where the dense f64 host Gram cannot exist (m=32768). Shared permutation
set; asserts statistic agreement to 1e-6 and p-value agreement to the
permutation-count granularity. Run from the repo root on the real chip:
    python examples/gof_precise_check.py

Reference obligation: torch_two_sample usage at
/root/reference/src/vgan.py:419-428 (capability being scaled).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np
import jax

from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled_sweep

n = 16384
rng = np.random.default_rng(0)
x = rng.normal(size=(n, 8)).astype(np.float32)
y = rng.normal(size=(n, 8)).astype(np.float32)  # null regime
n_perm = 64
base = np.concatenate([np.ones(n), np.zeros(n)])
perms = np.stack([rng.permutation(base) for _ in range(n_perm)])
alphas = [0.01, 1.0]

print("devices:", jax.devices())
t0 = time.time()
s_dev, p_dev = mmd_permutation_test_tiled_sweep(
    x, y, alphas, jax.random.PRNGKey(0), n_permutations=n_perm,
    precision="float64", permutations=perms)
s_dev, p_dev = np.asarray(s_dev), np.asarray(p_dev)
print(f"device precise: {time.time()-t0:.1f}s  stats={s_dev}  pvals={p_dev}")

# blockwise f64 oracle: C = A @ K in row-blocks of K, never m^2 resident
t0 = time.time()
z = np.concatenate([x, y]).astype(np.float64)
m = 2 * n
zn = (z * z).sum(1)
A = np.concatenate([base[None, :], perms]).astype(np.float64)
B = 1.0 - A
blk = 2048
for ai, alpha in enumerate(alphas):
    s_xx = np.zeros(A.shape[0]); s_xy = np.zeros(A.shape[0]); total = 0.0
    for r0 in range(0, m, blk):
        r1 = min(r0 + blk, m)
        d2 = np.maximum(zn[r0:r1, None] + zn[None, :] - 2.0 * (z[r0:r1] @ z.T), 0.0)
        k = np.exp(-alpha * d2)
        k[np.arange(r0, r1) - r0, np.arange(r0, r1)] = 0.0
        ck = A[:, r0:r1] @ k  # (P, m)
        s_xx += np.einsum("pm,pm->p", ck, A)
        s_xy += np.einsum("pm,pm->p", ck, B)
        total += k.sum()
    s_yy = total - s_xx - 2.0 * s_xy
    stats = (s_xx / (n * (n - 1)) + s_yy / (n * (n - 1)) - 2.0 * s_xy / (n * n))
    obs = stats[0]
    pv = float(np.mean(stats[1:] >= obs))
    print(f"oracle alpha={alpha}: stat={obs:.6e} p={pv:.4f} "
          f"(device {s_dev[ai]:.6e} / {p_dev[ai]:.4f}) "
          f"absdiff={abs(obs - s_dev[ai]):.2e}")
    assert abs(obs - s_dev[ai]) < 1e-6, "stat mismatch"
    assert abs(pv - p_dev[ai]) <= 2.0 / n_perm + 1e-9, "pval mismatch"
print(f"oracle took {time.time()-t0:.1f}s")
print("COUNT=16384 PRECISE GOF: OK")
