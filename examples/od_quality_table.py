"""Seeded multi-dataset OD quality table: subspace ensemble vs full space.

VERDICT round-2 item 8: quantify the paper's central claim (arXiv:2504.07522
— the learned subspace ensemble dominates full-space detectors when the
anomaly signal lives in a subspace of a high-dimensional space) as a
mean +/- std AUC table over >= 5 seeds, across the native base-detector
family (knn / lof / iforest / mahalanobis / loda / kde / hbos / copod / ecod), on bundled sklearn datasets
(noise-augmented, the paper's regime) plus synthetic ADBench-style
generators at d >= 100. No network access here, so the ADBench tables
themselves cannot be reproduced; these generators follow ADBench's anomaly
taxonomy (global / local / dependency) with the signal confined to a small
informative subspace.

Writes the table to docs/QUALITY.md and prints it.

Run (TPU or CPU):  python examples/od_quality_table.py [--seeds 5 --epochs 50]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse

import numpy as np

from vgan_tpu import VGAN, VGAN_no_kl
from vgan_tpu.ensemble import SubspaceEnsemble

from od_quality_eval import auc, one_class_task  # noqa: E402 (sibling example)

BASES = (
    "knn", "lof", "abod", "cof", "iforest", "mahalanobis", "cblof", "gmm",
    "loda", "kde", "inne", "pca", "sampling", "kpca", "mcd", "ae",
    "dsvdd", "sod", "ocsvm", "hbos", "copod", "ecod", "hetero",
)

# Smoke mode for CI/dev: 2 bases, first dataset only (set VGAN_QT_SMOKE=1).
import os  # noqa: E402

if os.environ.get("VGAN_QT_SMOKE") == "1":
    BASES = ("knn", "hbos")


# ---------------------------------------------------------------------------
# synthetic ADBench-style tasks (d >= 100, signal in a small subspace)
# ---------------------------------------------------------------------------


def _latent_inliers(rng, n, d_inf, d_noise):
    """Correlated informative block (rank-3 factor model) + noise dims."""
    w = rng.normal(size=(3, d_inf))
    z = rng.normal(size=(n, 3))
    informative = z @ w + 0.3 * rng.normal(size=(n, d_inf))
    noise = rng.normal(size=(n, d_noise))
    return np.concatenate([informative, noise], axis=1)


def synth_task(kind, rng, n=1200, d_inf=8, d_noise=120, anomaly_frac=0.08):
    """(x, y) with y=1 anomalies; anomaly signal ONLY in the informative
    dims (ADBench taxonomy: 'global' uniform-tail, 'local' scaled-cluster,
    'dependency' correlation-broken)."""
    x_in = _latent_inliers(rng, n, d_inf, d_noise)
    n_out = max(5, int(anomaly_frac * n))
    x_out = _latent_inliers(rng, n_out, d_inf, d_noise)
    if kind == "global":
        # ADBench's global definition: uniform over the 1.1-expanded range
        # of the informative dims
        lo = x_in[:, :d_inf].min(0)
        hi = x_in[:, :d_inf].max(0)
        x_out[:, :d_inf] = rng.uniform(
            1.1 * lo, 1.1 * hi, size=(n_out, d_inf)
        )
    elif kind == "local":
        # same cluster structure, inflated local scale
        x_out[:, :d_inf] = x_out[:, :d_inf] * 2.5
    elif kind == "dependency":
        # break the factor correlation: independent per-dim resample
        for j in range(d_inf):
            x_out[:, j] = rng.permutation(x_in[:, j])[:n_out]
        x_out[:, :d_inf] += 0.8 * rng.normal(size=(n_out, d_inf))
    else:
        raise ValueError(kind)
    x = np.concatenate([x_in, x_out])
    y = np.concatenate([np.zeros(n), np.ones(n_out)])
    return x, y


def synth_split(kind, rng):
    x, y = synth_task(kind, rng)
    inl = x[y == 0]
    out = x[y == 1]
    rng.shuffle(inl)
    n_tr = int(0.6 * len(inl))
    x_tr, x_in_te = inl[:n_tr], inl[n_tr:]
    x_te = np.concatenate([x_in_te, out])
    labels = np.concatenate([np.zeros(len(x_in_te)), np.ones(len(out))])
    mu, sd = x_tr.mean(0), x_tr.std(0) + 1e-9
    return (
        ((x_tr - mu) / sd).astype(np.float32),
        ((x_te - mu) / sd).astype(np.float32),
        labels,
    )


# ---------------------------------------------------------------------------


def task_splits(seed, adbench_dir=None):
    """All (name, x_tr, x_te, labels) splits for one seed. With
    ``adbench_dir``, every ``*.npz`` there (ADBench format: X, y with y=1
    anomalies — the real datasets the reference's experiment branches
    drive; this box has no network, so users supply the files) becomes an
    additional row under the same one-class protocol."""
    from sklearn import datasets as skd

    if os.environ.get("VGAN_QT_SMOKE") == "1":
        rng = np.random.default_rng(seed)
        bc = skd.load_breast_cancer()
        noise = rng.normal(size=(len(bc.data), 50)) * bc.data.std()
        x = np.concatenate([bc.data, noise], axis=1)
        return [("bc+50nz-smoke",) + one_class_task(
            np.asarray(x, np.float64), np.asarray(bc.target), 0, rng)]

    rng = np.random.default_rng(seed)

    def with_noise(x, n_noise):
        noise = rng.normal(size=(len(x), n_noise))
        return np.concatenate([x, noise * x.std()], axis=1)

    bc = skd.load_breast_cancer()
    dg = skd.load_digits()
    dg_m = np.isin(dg.target, [0, 6])
    wn = skd.load_wine()

    out = []
    dg_17 = np.isin(dg.target, [1, 7])
    dg_38 = np.isin(dg.target, [3, 8])
    for name, x, y, anom in (
        ("bc+200nz", with_noise(bc.data, 200), bc.target, 0),
        ("digits0v6+400nz", with_noise(dg.data[dg_m], 400), dg.target[dg_m], 6),
        ("digits1v7+400nz", with_noise(dg.data[dg_17], 400), dg.target[dg_17], 7),
        ("digits3v8+400nz", with_noise(dg.data[dg_38], 400), dg.target[dg_38], 8),
        ("wine+100nz", with_noise(wn.data, 100), wn.target, 2),
    ):
        out.append(
            (name,)
            + one_class_task(np.asarray(x, np.float64), np.asarray(y), anom, rng)
        )
    for kind in ("global", "local", "dependency"):
        out.append((f"synth-{kind}(d=128)*",) + synth_split(kind, rng))
    if adbench_dir is not None:
        from vgan_tpu.data import load_adbench

        files = sorted(Path(adbench_dir).glob("*.npz"))
        if not files:
            raise FileNotFoundError(
                f"no .npz files in --adbench-dir {adbench_dir}"
            )
        for f in files:
            x, y = load_adbench(f)
            out.append(
                (f"adb:{f.stem}",)
                + one_class_task(np.asarray(x, np.float64), y, 1, rng)
            )
    return out


def _fit_pool(model, x_tr, nsubs=500):
    model.fit(x_tr)
    model.approx_subspace_dist(nsubs)
    return model.subspaces, model.proba


# learned / derived mask pools, in column order (full + fb follow)
LEARNED_POOLS = ("nokl", "klq", "klt", "klg", "georand")


def _get_pool(pool, seed, name, x_tr, epochs, kl_epochs, cache, cache_path):
    """Fit (or load from the pool-level cache) one mask pool.

    Pools are deterministic per (seed, dataset): VGAN rehardcodes seed 777
    (reference vgan.py:45) and VGAN_no_kl takes an explicit seed, so the
    masks themselves are cacheable — adding a new BASE later re-scores
    against cached masks instead of refitting 500-epoch kl programs.

    - ``nokl``:    VGAN_no_kl, the variant round 3 measured;
    - ``klq``:     VGAN with reference quirks — the generator is detached
                   exactly as torch ``Variable()`` detaches at
                   /root/reference/src/vgan.py:308-310, so its mask
                   distribution is the init-time geometry;
    - ``klt``:     VGAN with ONLY ``replicate_generator_detach=False`` —
                   the paper-intended adversarial kernel learning under the
                   reference's mask-as-constant gradient estimator
                   (Generator.py:18-22: zero gradient through selected
                   coordinates);
    - ``klg``:     klt but trained with the Gumbel-ST estimator
                   (``generator_grad='gumbel_st'``) — gradients actually
                   flow through the binarization (round-4 VERDICT item 1:
                   does adversarial training matter once it CAN move?);
    - ``georand``: geometry-matched random control — one random mask per
                   klq (init-geometry) mask with the SAME active-dim count
                   and the SAME pool probability, positions uniform. If
                   this scores like klq, the generator's contribution is
                   the size/count distribution alone, not the positions
                   or their near-complementary structure.
    """
    key = f"POOL|{seed}|{name}|{pool}|e{epochs}"
    if key in cache:
        masks_s, proba = cache[key]
        masks = np.array(
            [[c == "1" for c in row] for row in masks_s], bool
        )
        return masks, np.asarray(proba, np.float64)
    bs = min(500, len(x_tr))
    d = x_tr.shape[1]
    if pool == "nokl":
        masks, proba = _fit_pool(VGAN_no_kl(
            epochs=epochs, lr=0.007, batch_size=bs,
            seed=int(1000 + seed), verbose=False,
        ), x_tr)
    elif pool == "klq":
        masks, proba = _fit_pool(VGAN(
            epochs=kl_epochs, batch_size=bs, verbose=False,
        ), x_tr)
    elif pool == "klt":
        masks, proba = _fit_pool(VGAN(
            epochs=kl_epochs, batch_size=bs, verbose=False,
            replicate_generator_detach=False,
        ), x_tr)
    elif pool == "klg":
        masks, proba = _fit_pool(VGAN(
            epochs=kl_epochs, batch_size=bs, verbose=False,
            replicate_generator_detach=False, generator_grad="gumbel_st",
        ), x_tr)
    elif pool == "georand":
        kmasks, kproba = _get_pool(
            "klq", seed, name, x_tr, epochs, kl_epochs, cache, cache_path
        )
        grng = np.random.default_rng(3000 + seed)
        masks = np.zeros_like(kmasks)
        for i, s in enumerate(kmasks.sum(axis=1)):
            masks[i, grng.choice(d, size=int(s), replace=False)] = True
        proba = kproba
    else:  # pragma: no cover
        raise ValueError(pool)
    masks = np.asarray(masks, bool)
    cache[key] = [
        ["".join("1" if v else "0" for v in row) for row in masks],
        [float(p) for p in np.asarray(proba)],
    ]
    _save_cache(cache_path, cache)
    return masks, np.asarray(proba, np.float64)


def eval_seed(seed, epochs, kl_epochs, cache, cache_path,
              adbench_dir=None):
    """{(dataset, base): (auc_nokl, auc_klq, auc_klt, auc_klg,
    auc_georand, auc_full, auc_fb)} for one seed (five learned/derived
    pools — see :func:`_get_pool` — plus the full-space detector and
    random feature bagging)."""
    from vgan_tpu.ensemble import random_subspaces

    results = {}
    for name, x_tr, x_te, labels in task_splits(seed, adbench_dir):
        key0 = lambda b: f"{seed}|{name}|{b}|e{epochs}"  # noqa: E731
        keyk = lambda b, v: f"{seed}|{name}|{b}|e{epochs}|{v}"  # noqa: E731
        missing = [
            b for b in BASES
            if key0(b) not in cache
            or any(keyk(b, v) not in cache
                   for v in ("klq", "klt", "klg", "georand"))
        ]
        if missing:
            bs = min(500, len(x_tr))
            d = x_tr.shape[1]

            def pool(p):
                return _get_pool(p, seed, name, x_tr, epochs, kl_epochs,
                                 cache, cache_path)

            full_mask = np.ones((1, d), bool)
            # 100 members (not 500): random masks don't dedupe the way V-GAN
            # draws collapse to ~10 unique subspaces, and bagging AUC
            # saturates well before 100 members — keeps the fb column
            # tractable
            fb_masks, fb_proba = random_subspaces(d, 100, seed=2000 + seed)

            def pool_auc(masks, proba, base, **kw):
                if base == "hetero":
                    # the suod/combo surface as ONE table row: a
                    # knn+lof+ecod HeterogeneousEnsemble with sel_suod-
                    # style consensus 'select' weighting over the SAME
                    # pool every homogeneous row uses
                    from vgan_tpu.ensemble import HeterogeneousEnsemble

                    kw.pop("normalize", None)  # members standardize
                    het = HeterogeneousEnsemble(
                        masks, proba,
                        members=[{"base": "knn"}, {"base": "lof"},
                                 {"base": "ecod"}],
                        combination="select", k=10, **kw,
                    ).fit(x_tr)
                    return float(auc(het.decision_function(x_te), labels))
                ens = SubspaceEnsemble(
                    masks, proba, base=base, k=10, **kw
                ).fit(x_tr)
                return float(auc(ens.decision_function(x_te), labels))

            for base in missing:
                if key0(base) not in cache:
                    cache[key0(base)] = [
                        pool_auc(*pool("nokl"), base),
                        pool_auc(full_mask, np.ones(1, np.float32), base,
                                 normalize=None),
                        pool_auc(fb_masks, fb_proba, base),
                    ]
                for v in ("klq", "klt", "klg", "georand"):
                    if keyk(base, v) not in cache:
                        cache[keyk(base, v)] = pool_auc(*pool(v), base)
            _save_cache(cache_path, cache)
            print(f"  seed {seed}: {name} done "
                  f"({len(missing)} bases computed)", flush=True)
        else:
            print(f"  seed {seed}: {name} cached", flush=True)
        for base in BASES:
            nokl, full, fb = cache[key0(base)]
            results[(name, base)] = (
                nokl, cache[keyk(base, "klq")], cache[keyk(base, "klt")],
                cache[keyk(base, "klg")], cache[keyk(base, "georand")],
                full, fb,
            )
    return results


def _save_cache(path, cache):
    import json

    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(cache))
    tmp.replace(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--adbench-dir", default=None,
                    help="directory of ADBench .npz datasets (X, y; y=1 "
                         "= anomaly) to add as real-data rows — no "
                         "network here, so supply the files (ADBench "
                         "repo: adbench/datasets/Classical)")
    ap.add_argument("--kl-epochs", type=int, default=500,
                    help="epoch budget for the two VGAN (kernel-learning) "
                         "pools — the reference default is 2000 but its "
                         "loss plateaus long before; 500 is past the "
                         "trained-generator loss plateau on these tasks")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "docs" / "QUALITY.md"))
    ap.add_argument("--cache", default=str(Path(__file__).resolve().parent
                                           / ".quality_cache.json"),
                    help="per-(seed, dataset, base, epochs) AUC cache — "
                         "interrupted runs resume, and adding a base "
                         "recomputes only the new rows (delete to force a "
                         "full rerun); the key includes the epoch budget "
                         "so changed settings never reuse stale numbers")
    args = ap.parse_args()

    import json

    cache_path = Path(args.cache)
    cache = (
        json.loads(cache_path.read_text()) if cache_path.exists() else {}
    )
    per_seed = [
        eval_seed(s, args.epochs, args.kl_epochs, cache, cache_path,
                  adbench_dir=args.adbench_dir)
        for s in range(args.seeds)
    ]
    keys = list(per_seed[0].keys())

    POOLS = ("no-kl", "kl(ref)", "kl(trained)", "kl(gumbel)", "geo-rand",
             "full", "fb")
    N_LEARNED = 5   # first five columns are learned/derived pools
    FULL, FB = 5, 6

    def mean_of(key, idx):
        return float(np.mean([ps[key][idx] for ps in per_seed]))

    def seeds_of(key, idx):
        return np.array([ps[key][idx] for ps in per_seed])

    def paired_stats(ks, i, j, n_boot=10000):
        """(wins, mean delta, bootstrap CI95 lo/hi, wilcoxon p) for pool i
        vs pool j over the (dataset, base) pairs ``ks``, paired on the
        seed-mean. Inference lives HERE (n = len(ks) pairs): per-pair
        n=5 seeds cannot reach p < 0.05 (exact two-sided Wilcoxon floor
        at n=5 is 0.0625), so pair-level marks are descriptive only."""
        from scipy import stats as sps

        deltas = np.array([mean_of(k, i) - mean_of(k, j) for k in ks])
        wins = int(np.sum(deltas >= 0))
        brng = np.random.default_rng(0)
        boots = np.array([
            deltas[brng.integers(0, len(deltas), len(deltas))].mean()
            for _ in range(n_boot)
        ])
        lo, hi = np.percentile(boots, [2.5, 97.5])
        if np.allclose(deltas, 0.0):
            p = 1.0
        else:
            p = float(sps.wilcoxon(deltas, zero_method="wilcox").pvalue)
        return wins, float(deltas.mean()), float(lo), float(hi), p

    lines = [
        "# OD quality: learned subspace ensembles vs full-space detector",
        "",
        f"Mean +/- std ROC AUC over {args.seeds} seeds "
        f"(VGAN_no_kl epochs={args.epochs}, VGAN kl epochs={args.kl_epochs}, "
        "500 sampled subspaces, k=10; generated by "
        "examples/od_quality_table.py). The paper's claim (arXiv:2504.07522) "
        "is evaluated in its demonstrated regime — REAL datasets whose "
        "signal hides among appended irrelevant noise features — plus three "
        "ADBench-taxonomy synthetic STRESS rows (marked *) at d=128 where "
        "the informative structure is a subtle rank-3 factor block.",
        "",
        "Five LEARNED/DERIVED generator pools (rounds 3-5 VERDICT "
        "ablations): `no-kl` = VGAN_no_kl; `kl(ref)` = VGAN with reference "
        "quirks — the generator is detached exactly as torch `Variable()` "
        "detaches at reference vgan.py:308-310, so its masks are the "
        "init-time geometry; `kl(trained)` = VGAN with only "
        "`replicate_generator_detach=False` — the paper-intended "
        "adversarial training, but under the reference's mask-as-constant "
        "gradient estimator (Generator.py:18-22 zeroes the gradient "
        "through every selected coordinate); `kl(gumbel)` = kl(trained) "
        "with `generator_grad='gumbel_st'` — the Gumbel-ST estimator, so "
        "gradients actually FLOW through the binarization (the round-4 "
        "de-confounding control: does adversarial training matter once it "
        "can move the masks?); `geo-rand` = geometry-matched random "
        "control — one uniform-position random mask per kl(ref) mask with "
        "the same active-dim count and pool probability (does the "
        "generator beat size-matched random masks at all?). `fb` is a "
        "RANDOM feature-bagging pool (100 masks, pyod convention; bagging "
        "AUC saturates well before 100 members). Bold = best learned pool "
        "when it beats the full space on the seed-mean; a trailing ° "
        "marks pairs where it also wins on EVERY seed (the strongest "
        "per-pair evidence 5 shared seeds can give — per-pair n=5 cannot "
        "reach p<0.05, exact two-sided Wilcoxon floors at 0.0625, so "
        "inference lives in the pool-level tests below).",
        "",
        "| dataset | base | no-kl | kl(ref) | kl(trained) | kl(gumbel) | "
        "geo-rand | full | fb |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    wins = 0       # best learned pool >= full
    fb_wins = 0    # best learned pool >= fb
    for name, base in keys:
        cols = [
            np.array([ps[(name, base)][i] for ps in per_seed])
            for i in range(len(POOLS))
        ]
        learned_best = int(np.argmax([c.mean() for c in cols[:N_LEARNED]]))
        w = cols[learned_best].mean() >= cols[FULL].mean()
        wins += int(w)
        fb_wins += int(cols[learned_best].mean() >= cols[FB].mean())
        txts = [f"{c.mean():.3f} +/- {c.std():.3f}" for c in cols]
        if w:
            every_seed = bool(np.all(cols[learned_best] >= cols[FULL]))
            txts[learned_best] = (
                f"**{txts[learned_best]}**" + ("°" if every_seed else "")
            )
        lines.append(
            f"| {name} | {base} | " + " | ".join(txts) + " |"
        )
    real_keys = [k for k in keys if not k[0].endswith("*")]

    best_real = sum(
        1 for k in real_keys
        if max(mean_of(k, i) for i in range(N_LEARNED)) >= mean_of(k, FULL)
    )
    lines += [
        "",
        f"Best learned pool >= full-space on the mean in {wins}/{len(keys)} "
        f"pairs overall; {best_real}/{len(real_keys)} on the real "
        "noise-augmented tasks (the paper's regime). Best learned >= random "
        f"feature bagging in {fb_wins}/{len(keys)} pairs overall.",
        "",
        "Pairwise pool comparison on the real tasks "
        f"({len(real_keys)} (dataset, base) pairs, paired on the "
        "seed-mean). p = exact two-sided Wilcoxon signed-rank over the "
        "per-pair deltas; CI95 = paired bootstrap (10k resamples) on the "
        "mean delta. Round-4 VERDICT item 5: claims whose CI crosses 0 "
        "and p > 0.05 are reported as NOT distinguishable from noise.",
        "",
    ]
    pool_pairs = [
        ("kl(trained) vs no-kl", 2, 0),
        ("kl(trained) vs kl(ref)", 2, 1),
        ("kl(gumbel) vs kl(ref)", 3, 1),
        ("kl(gumbel) vs kl(trained)", 3, 2),
        ("kl(ref) vs geo-rand", 1, 4),
        ("geo-rand vs fb", 4, 6),
        ("kl(trained) vs fb", 2, 6),
        ("kl(trained) vs full", 2, 5),
        ("no-kl vs fb", 0, 6),
        ("no-kl vs full", 0, 5),
        ("kl(ref) vs fb", 1, 6),
    ]
    for label, i, j in pool_pairs:
        n_win, md, lo, hi, p = paired_stats(real_keys, i, j)
        sig = "" if p > 0.05 else " — significant"
        lines.append(
            f"- **{label}**: {n_win}/{len(real_keys)} wins, mean AUC "
            f"delta {md:+.4f} (CI95 [{lo:+.4f}, {hi:+.4f}]), "
            f"Wilcoxon p={p:.2g}{sig}"
        )
    lines += [
        "",
        "Per-base view on the real tasks (wins on the seed-mean and mean "
        "AUC delta for each learned pool vs full / vs fb; "
        f"n={len(real_keys) // len(BASES)} datasets per base — "
        "descriptive only at this n):",
        "",
    ]
    for base in BASES:
        ks = [k for k in real_keys if k[1] == base]
        parts = []
        for label, idx in (("no-kl", 0), ("kl-t", 2), ("kl-g", 3)):
            deltas = [mean_of(k, idx) - mean_of(k, FULL) for k in ks]
            fb_deltas = [mean_of(k, idx) - mean_of(k, FB) for k in ks]
            parts.append(
                f"{label}: vs full {sum(d >= 0 for d in deltas)}/{len(ks)} "
                f"({np.mean(deltas):+.3f}), vs fb "
                f"{sum(d >= 0 for d in fb_deltas)}/{len(ks)} "
                f"({np.mean(fb_deltas):+.3f})"
            )
        lines.append(f"- **{base}** — " + "; ".join(parts))
    if args.adbench_dir is None:
        lines += [
            "",
            "**Real ADBench data — unavailable on this box.** The "
            "reference's README (README.md:56-63) points at ADBench's "
            "`get_data.sh`; this machine has zero network egress, so the "
            "paper's actual datasets cannot be downloaded here. The "
            "loader is ready: drop ADBench `.npz` files (X, y; y=1 = "
            "anomaly) in a directory and re-run with "
            "`--adbench-dir DIR` to add real rows under the identical "
            "protocol (vgan_tpu/data.py::load_adbench validates the "
            "contract loudly). Until then the noise-augmented sklearn "
            "rows above are the closest same-regime proxy.",
        ]
    lines += [
        "",
        "**Adversarial kernel learning (kl) verdict** (prose maintained in "
        "examples/od_quality_table.py next to the run that produced the "
        "numbers; the pairwise counts above are generated). Three "
        "findings — one positive, two deflationary; the round-4 VERDICT's "
        "two confounds (gradient estimator, mask positions) are now both "
        "controlled:",
        "",
        "1. *The kl ensemble is the best learned pool on this benchmark, "
        "and the edge is significant.* kl(trained) beats no-kl on 81/115 "
        "real pairs (+0.021 mean AUC, p=1.9e-09), random feature bagging "
        "on 83/115 (+0.017, p=2.5e-07), and the full-space detector on "
        "79/115 (+0.031, p=2.9e-08). It also repairs no-kl's round-3 "
        "losses: on the knn/lof/kde/cblof rows where no-kl trailed fb, "
        "kl(trained) draws level or wins (per-base view above). The only "
        "bases where it still loses to fb/full are the dim-decomposable "
        "marginal detectors (hbos/copod), where projection itself does "
        "not pay — consistent with the round-3 diagnosis.",
        "",
        "2. *Adversarial optimization contributes nothing measurable — "
        "even when gradients actually flow.* kl(trained) vs kl(ref) — "
        "identical in everything except that kl(ref)'s generator is "
        "detached exactly as the reference's torch `Variable()` bug "
        "detaches it — is indistinguishable from noise (67/115, +0.0007, "
        "CI95 crosses 0, p=0.61). The round-4 objection was that this "
        "only shows the reference's mask-as-constant estimator can't "
        "move the masks; the kl(gumbel) column closes it: with the "
        "Gumbel-ST estimator passing real gradients through the "
        "binarization, the pool still does not improve — kl(gumbel) vs "
        "kl(ref) is -0.0002 mean AUC (the p=4.5e-04 is a consistently "
        "signed but practically nil shift), and kl(gumbel) is marginally "
        "WORSE than kl(trained) (-0.0009, p=0.0071). Training still "
        "matters per-dataset in both directions (mahalanobis on "
        "digits1v7/3v8: detached 0.952/0.888 -> trained 0.971/0.989), "
        "but on average 500 epochs of the paper-intended adversarial "
        "game move nothing, under either estimator.",
        "",
        "3. *WHICH dims the generator picks doesn't matter either — only "
        "the mask-size distribution transfers.* The geometry-matched "
        "random control (uniform-position masks with kl(ref)'s exact "
        "per-mask active-dim counts and pool probabilities) is slightly "
        "BETTER than the kl pool it mimics (kl(ref) vs geo-rand: 43/115, "
        "-0.0052, p=2.1e-09) and beats random feature bagging by the "
        "same margin the kl pools do (+0.021, 91/115, p=1.3e-12). So on "
        "this task family the entire kl advantage is carried by its "
        "mask-size geometry — a few large, near-complementary ~d/2 "
        "subspaces from the N(0, 0.1) init through upper_softmax "
        "binarization — not by WHERE those masks land. The reference's "
        "never-trained kl generator (the Variable() detach this repo "
        "documented in round 1) is therefore harmless on the paper's own "
        "task family: the only asset was never the training, and a "
        "user can get the same ensemble quality from size-matched random "
        "masks. Caveat: these tasks drown REAL signal in appended "
        "iid noise, where any ~d/2 mask keeps ~half the signal; the "
        "position-sensitivity the paper posits would only show on data "
        "where informative dims are few and must be FOUND (see the "
        "stress rows below and the stress-grid appendix).",
        "",
        "**Learned vs random bagging**: kl(trained)'s edge over fb is "
        "broad (abod/iforest/loda/gmm strongest, +0.03-0.05); no-kl's "
        "is narrow (iforest/loda only). For the stable distance bases a "
        "100-member random pool averages out the noise dimensions, which "
        "is why no-kl's ~10-unique-subspace pool only matches it — the "
        "kl pool's larger masks retain more signal per member. Where "
        "learned pools lose to the FULL space (hbos/copod), random "
        "bagging loses the same way — projection itself doesn't pay "
        "there, the LEARNED distribution is not the problem.",
        "",
        "**Honest negative result on the * stress rows**: no learned "
        "operator isolates the 8-dim rank-3 factor block at d=128 "
        "under this training budget — the no-kl masks' informative-dim "
        "fraction stays at the 8/128 base rate from 50 through 2000 "
        "epochs (measured), and kl(trained) == kl(ref) on every stress "
        "row (the adversarial training moves nothing there either), so "
        "the subspace ensembles neither exploit nor destroy the signal "
        "and the full-space detector's small edge persists on the "
        "distance bases. The kl pools still clear no-kl by +0.03-0.05 on "
        "these rows — pure geometry again: ~d/2 masks keep ~4 of the 8 "
        "informative dims per member, no-kl's smaller masks keep fewer. The paper's mechanism requires the operator to "
        "find the subspace; when the subspace signal is distributional "
        "but weak per-dimension (a spread factor block rather than "
        "distinct marginal structure), V-GAN training at reference "
        "hyperparameters does not concentrate on it. Wine (70 train "
        "rows) is additionally seed-dominated: per-seed spreads of "
        "+/-0.15 AUC swamp the method difference; longer training "
        "(500 epochs probed) does not change either finding.",
    ]
    text = "\n".join(lines) + "\n"
    # preserve the appendix (suod-stage / stress-grid sections maintained
    # by their own scripts) below the marker, if present
    marker = "<!-- appendix -->"
    out_path = Path(args.out)
    if out_path.exists() and marker in out_path.read_text():
        appendix = out_path.read_text().split(marker, 1)[1]
        text += "\n" + marker + appendix
    out_path.write_text(text)
    print("\n" + text)
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
