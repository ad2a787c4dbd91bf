"""Stress-row capability boundary: can ANY recipe concentrate kl masks
on the planted informative block?

Round-4 VERDICT item 6: QUALITY.md's negative result — "V-GAN training at
reference hyperparameters does not concentrate on the factor block" — was
probed at ONE recipe (epochs only). This script grids over
lr x temperature (coverage weight) x epochs x latent size x gradient
estimator (including the round-5 straight-through paths) on the three
synth-* stress tasks (d=128, 8-dim rank-3 factor block; the ADBench
taxonomy rows of examples/od_quality_table.py) and measures, per trained
pool of 500 sampled subspaces:

- ``inf-mass``: probability-weighted fraction of each mask's active dims
  that land in the planted block, sum_i p_i * |m_i & inf| / |m_i|.
  Base rate (uniform-random positions) = 8/128 = 0.0625.
- ``enrich``: inf-mass / base rate (>1 = concentrates on the block).
- ``knn-AUC``: downstream quality of the pool with the knn base (k=10),
  so concentration is tied to what a user gains.

The init-geometry pool (klq — the reference's detached generator, i.e.
ZERO training) is the per-seed control: `enrich` above klq's value is
what *training* contributed. Writes the ``stress-grid`` appendix section
of docs/QUALITY.md.

Reference tie-in: the subspace-recovery capability implied by
/root/reference/test.ipynb cell 12 (the 10-d demo recovers the planted
{0,8,9} coupling) scaled to the d=128 stress regime.

Run (TPU):  python examples/stress_grid.py [--seeds 2 --quick]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))

import argparse
import itertools
import json

import numpy as np

from vgan_tpu import VGAN
from vgan_tpu.ensemble import SubspaceEnsemble

from docs_sections import write_section  # noqa: E402
from od_quality_eval import auc  # noqa: E402
from od_quality_table import synth_split  # noqa: E402

D_INF = 8  # informative dims are columns [0, D_INF) of the synth tasks
KINDS = ("global", "local", "dependency")

# grid axes (VERDICT item 6's list, verbatim)
ESTIMATORS = ("reference", "st", "gumbel_st")
LRS = (0.007, 0.05)
TEMPERATURES = (0.0, 10.0)
EPOCHS = (500, 2000)
LATENTS = (None, 32)  # None = reference rule max(128//16, 1) = 8


def pool_metrics(masks, proba, x_tr, x_te, labels):
    """(inf_mass, enrich, n_unique, mean_size, knn_auc) for one pool."""
    masks = np.asarray(masks, bool)
    proba = np.asarray(proba, np.float64)
    sizes = masks.sum(axis=1)
    frac = masks[:, :D_INF].sum(axis=1) / np.maximum(sizes, 1)
    inf_mass = float((proba * frac).sum() / proba.sum())
    base = D_INF / masks.shape[1]
    ens = SubspaceEnsemble(masks, proba, base="knn", k=10).fit(x_tr)
    a = float(auc(ens.decision_function(x_te), labels))
    return (
        inf_mass, inf_mass / base, int(len(masks)),
        float((proba * sizes).sum() / proba.sum()), a,
    )


def fit_pool(x_tr, *, estimator, lr, temperature, epochs, latent, detach):
    m = VGAN(
        epochs=epochs, batch_size=min(500, len(x_tr)), lr_G=lr, lr_D=lr,
        temperature=temperature, verbose=False,
        replicate_generator_detach=detach,
        generator_grad=estimator, latent_size=latent,
    )
    m.fit(x_tr)
    m.approx_subspace_dist(500)
    return m.subspaces, m.proba


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="single kind ('global'), 1 seed, coarse grid")
    ap.add_argument("--cache", default=str(Path(__file__).resolve().parent
                                           / ".stress_grid_cache.json"))
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "docs" / "QUALITY.md"))
    args = ap.parse_args()

    kinds = ("global",) if args.quick else KINDS
    seeds = 1 if args.quick else args.seeds
    grid = list(itertools.product(ESTIMATORS, LRS, TEMPERATURES, EPOCHS,
                                  LATENTS))
    if args.quick:
        grid = [g for g in grid if g[3] == 500]

    cache_path = Path(args.cache)
    cache = (
        json.loads(cache_path.read_text()) if cache_path.exists() else {}
    )

    def cached(key, fn):
        if key not in cache:
            cache[key] = fn()
            tmp = cache_path.with_suffix(".tmp")
            tmp.write_text(json.dumps(cache))
            tmp.replace(cache_path)
        return cache[key]

    # rows[(kind, config_label)] = list over seeds of metric tuples
    rows = {}
    base_rows = {}
    for seed in range(seeds):
        for kind in kinds:
            rng = np.random.default_rng(seed)
            x_tr, x_te, labels = synth_split(kind, rng)

            # control: the init-geometry pool (detached generator = the
            # reference's actual kl behavior; zero training signal)
            key = f"{seed}|{kind}|klq"
            base_rows.setdefault(kind, []).append(cached(
                key, lambda: pool_metrics(*fit_pool(
                    x_tr, estimator="reference", lr=0.007, temperature=0.0,
                    epochs=500, latent=None, detach=True,
                ), x_tr, x_te, labels)))

            for est, lr, temp, ep, lat in grid:
                label = (f"{est},lr={lr},T={temp:g},e={ep},"
                         f"L={lat if lat else 8}")
                key = f"{seed}|{kind}|{label}"
                rows.setdefault((kind, label), []).append(cached(
                    key, lambda: pool_metrics(*fit_pool(
                        x_tr, estimator=est, lr=lr, temperature=temp,
                        epochs=ep, latent=lat, detach=False,
                    ), x_tr, x_te, labels)))
            print(f"seed {seed}: {kind} done ({len(grid)} configs)",
                  flush=True)

    # ---- report ---------------------------------------------------------
    def agg(tuples):
        a = np.array(tuples, np.float64)
        return a.mean(axis=0)

    lines = [
        "## Stress-grid: can any recipe concentrate masks on the planted "
        "block?",
        "",
        f"Grid over gradient estimator x lr x coverage weight (temperature)"
        f" x epochs x latent size on the synth-* stress tasks (d=128, "
        f"informative block = 8 dims, base rate {D_INF}/128 = "
        f"{D_INF/128:.4f}); {seeds} seed(s), 500 sampled subspaces per "
        "fitted pool; generated by examples/stress_grid.py. `enrich` is "
        "the probability-weighted informative-dim fraction over the base "
        "rate (1.0 = uniform-random positions); klq is the init-geometry "
        "control (the reference's detached generator — zero training).",
        "",
    ]
    for kind in kinds:
        klq = agg(base_rows[kind])
        lines += [
            f"### synth-{kind}(d=128)",
            "",
            "| config | inf-mass | enrich | uniq | mean size | knn AUC |",
            "|---|---|---|---|---|---|",
            (f"| klq control (no training) | {klq[0]:.4f} | {klq[1]:.2f} |"
             f" {klq[2]:.0f} | {klq[3]:.1f} | {klq[4]:.3f} |"),
        ]
        kind_rows = sorted(
            ((label, agg(v)) for (k, label), v in rows.items()
             if k == kind),
            key=lambda t: -t[1][1],
        )
        for label, m in kind_rows:
            lines.append(
                f"| {label} | {m[0]:.4f} | {m[1]:.2f} | {m[2]:.0f} |"
                f" {m[3]:.1f} | {m[4]:.3f} |"
            )
        lines.append("")

    # verdict paragraph: best enrichment vs the control
    best = {}
    for kind in kinds:
        kind_rows = [(label, agg(v)) for (k, label), v in rows.items()
                     if k == kind]
        label, m = max(kind_rows, key=lambda t: t[1][1])
        best[kind] = (label, m, agg(base_rows[kind]))
    concentrated = {k: v for k, v in best.items() if v[1][1] >= 2.0}
    if concentrated:
        msg = "; ".join(
            f"synth-{k}: `{v[0]}` reaches enrich {v[1][1]:.2f} "
            f"(klq control {v[2][1]:.2f})" for k, v in concentrated.items()
        )
        lines.append(
            f"**Verdict: a concentrating recipe exists.** {msg}. The "
            "round-4 negative result was a hyperparameter observation, "
            "not a capability boundary."
        )
    else:
        msg = "; ".join(
            f"synth-{k}: best `{v[0]}` enrich {v[1][1]:.2f} "
            f"(klq {v[2][1]:.2f})" for k, v in best.items()
        )
        lines.append(
            f"**Verdict: refutation grid.** No cell of the "
            f"{len(grid)}-config grid exceeds 2x base-rate enrichment on "
            f"any stress task ({msg}). The negative result stands as a "
            "capability boundary of the V-GAN recipe at d=128, not a "
            "hyperparameter accident."
        )

    write_section(Path(args.out), "stress-grid", "\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
