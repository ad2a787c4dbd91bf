"""AOT serving export: serialized sampler round-trips and matches the live
model, including for batch sizes unseen at export (symbolic batch dim)."""

import numpy as np

from vgan_tpu import VGAN_no_kl
from vgan_tpu.serving import export_sampler, load_sampler, sample_masks


def test_export_load_roundtrip(tmp_path, rng):
    x = rng.normal(size=(96, 10)).astype(np.float32)
    m = VGAN_no_kl(batch_size=32, epochs=2, verbose=False)
    m.fit(x)

    path = tmp_path / "sampler.bin"
    export_sampler(m, path)
    assert path.stat().st_size > 0

    fn = load_sampler(path)
    masks = sample_masks(fn, nsubs=16, latent_size=m._latent_size, seed=m.seed)
    np.testing.assert_array_equal(masks, m.generate_subspaces(16))

    # different batch size than anything traced before (symbolic dim)
    masks2 = sample_masks(fn, nsubs=7, latent_size=m._latent_size, seed=m.seed)
    assert masks2.shape == (7, 10)


def test_ensemble_scorer_export_roundtrip(rng, tmp_path):
    """Exported ensemble decision_function == live one, across batch sizes
    (symbolic batch dim)."""
    from vgan_tpu.ensemble import SubspaceEnsemble
    from vgan_tpu.serving import export_ensemble_scorer, load_ensemble_scorer

    d = 9
    xtr = rng.normal(size=(50, d)).astype(np.float32)
    masks = rng.random(size=(5, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(5, 0.2, np.float32)
    ens = SubspaceEnsemble(masks, proba, base="knn", k=4, chunk=2).fit(xtr)

    path = tmp_path / "scorer.bin"
    export_ensemble_scorer(ens, path)
    fn = load_ensemble_scorer(path)
    for b in (3, 17):
        xte = rng.normal(size=(b, d)).astype(np.float32)
        np.testing.assert_allclose(
            fn(xte), ens.decision_function(xte), rtol=1e-5, atol=1e-6
        )


def test_per_subspace_scorer_export_roundtrip(rng, tmp_path):
    """Exported per-subspace matrix program == live per_subspace_scores
    (the 'aom'/'moa' serving path), across batch sizes."""
    from vgan_tpu.ensemble import SubspaceEnsemble
    from vgan_tpu.serving import (
        export_per_subspace_scorer,
        load_ensemble_scorer,
    )

    d = 8
    xtr = rng.normal(size=(40, d)).astype(np.float32)
    masks = rng.random(size=(5, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(5, 0.2, np.float32)
    ens = SubspaceEnsemble(masks, proba, base="knn", k=4, chunk=2,
                           aggregation="aom", n_buckets=2).fit(xtr)

    path = tmp_path / "per_subspace.bin"
    export_per_subspace_scorer(ens, path)
    fn = load_ensemble_scorer(path)  # same loader: exported.call wrapper
    for b in (3, 11):
        xte = rng.normal(size=(b, d)).astype(np.float32)
        np.testing.assert_allclose(
            fn(xte), ens.per_subspace_scores(xte), rtol=1e-5, atol=1e-6
        )


def test_dim_base_scorer_export_roundtrip(rng, tmp_path):
    """copod/hbos/ecod ensembles export (matmul-path program) and match the
    live decision_function and per_subspace_scores across batch sizes."""
    from vgan_tpu.ensemble import SubspaceEnsemble
    from vgan_tpu.serving import (
        export_ensemble_scorer,
        export_per_subspace_scorer,
        load_ensemble_scorer,
    )

    d = 8
    xtr = rng.normal(size=(60, d)).astype(np.float32)
    masks = rng.random(size=(6, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(6, 1 / 6, np.float32)

    for base in ("copod", "hbos", "ecod", "abod", "cof", "mahalanobis",
                 "cblof", "gmm", "loda", "kde", "inne", "pca", "sampling",
                 "kpca", "mcd", "ae", "dsvdd", "sod", "ocsvm", "sos", "lmdd"):
        ens = SubspaceEnsemble(masks, proba, base=base).fit(xtr)
        path = tmp_path / f"{base}.bin"
        export_ensemble_scorer(ens, path)
        fn = load_ensemble_scorer(path)
        for nt in (11, 23):
            xte = rng.normal(size=(nt, d)).astype(np.float32)
            np.testing.assert_allclose(
                fn(xte), ens.decision_function(xte), rtol=1e-5, atol=1e-6
            )

        ps_path = tmp_path / f"{base}_ps.bin"
        export_per_subspace_scorer(ens, ps_path)
        ps_fn = load_ensemble_scorer(ps_path)
        xte = rng.normal(size=(13, d)).astype(np.float32)
        np.testing.assert_allclose(
            ps_fn(xte), ens.per_subspace_scores(xte), rtol=1e-5, atol=1e-6
        )


def test_hetero_export_roundtrip(tmp_path, rng):
    """export_hetero_scorer: one serialized program (members + batch
    standardization + combination) matches the live decision_function for
    every combination mode, including in-program 'select' weights."""
    from vgan_tpu.ensemble import HeterogeneousEnsemble
    from vgan_tpu.serving import export_hetero_scorer, load_ensemble_scorer

    d = 9
    xtr = rng.normal(size=(70, d)).astype(np.float32)
    masks = rng.random(size=(7, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(7, 1 / 7, np.float32)

    for combination in ("average", "max", "select"):
        het = HeterogeneousEnsemble(
            masks, proba, combination=combination,
            members=[{"base": "knn", "k": 6}, {"base": "ecod"},
                     {"base": "loda", "n_projections": 24}],
        ).fit(xtr)
        path = tmp_path / f"het_{combination}.bin"
        export_hetero_scorer(het, path)
        fn = load_ensemble_scorer(path)
        for nt in (12, 25):
            xte = rng.normal(size=(nt, d)).astype(np.float32)
            np.testing.assert_allclose(
                fn(xte), het.decision_function(xte), rtol=2e-4, atol=1e-5
            )


def test_streaming_engaged_export_roundtrip(tmp_path, rng, monkeypatch):
    """Exporting a neighbor-base ensemble whose train set exceeds
    STREAM_NTR must trace (the streamed tile sizing cannot read the
    symbolic batch dim — it falls back to the export hint) and the loaded
    program must match the live scores. Regression: this previously
    raised InconclusiveDimensionOperation at export."""
    import vgan_tpu.ensemble.od as od
    from vgan_tpu.ensemble import SubspaceEnsemble
    from vgan_tpu.serving import export_ensemble_scorer, load_ensemble_scorer

    monkeypatch.setattr(od, "STREAM_NTR", 32)
    xtr = rng.normal(size=(64, 6)).astype(np.float32)
    masks = rng.random(size=(5, 6)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full(5, 0.2, np.float32)

    for base in ("knn", "lof"):
        ens = SubspaceEnsemble(masks, proba, base=base, k=4).fit(xtr)
        path = tmp_path / f"stream_{base}.bin"
        export_ensemble_scorer(ens, path)
        fn = load_ensemble_scorer(path)
        for nt in (9, 21):
            xte = rng.normal(size=(nt, 6)).astype(np.float32)
            np.testing.assert_allclose(
                fn(xte), ens.decision_function(xte), rtol=1e-4, atol=1e-6
            )
