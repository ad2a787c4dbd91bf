"""Serving export: AOT-serialized subspace sampler (StableHLO artifact).

Production-deployment story the reference lacks: the trained generator's
sampling path (noise -> linear stack -> upper-softmax -> binarize) is
exported with ``jax.export`` into a self-contained serialized artifact
(StableHLO + embedded weights) that a serving process can load and run
WITHOUT the model code — only jax itself. The artifact is
platform-checked at export (export on the platform you serve on, e.g. 'tpu'
or 'cpu').
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vgan_tpu.ops.activations import binarize_mask


def export_sampler(model, path) -> None:
    """Serialize the fitted model's mask sampler to ``path``.

    The exported function maps noise ``z (b, latent)`` (unconstrained
    symbolic batch dimension) to boolean masks ``(b, d)``. Weights are
    embedded as constants.
    """
    module = model._generator_module()
    params = model.generator_params

    def sample(z):
        return binarize_mask(module.apply(params, z), axis=-1)

    batch = jax.export.symbolic_shape("b")[0]
    z_spec = jax.ShapeDtypeStruct((batch, model._latent_size), jnp.float32)
    exported = jax.export.export(jax.jit(sample))(z_spec)
    Path(path).write_bytes(exported.serialize())


def load_sampler(path):
    """Load a serialized sampler; returns ``fn(z) -> bool masks``."""
    exported = jax.export.deserialize(Path(path).read_bytes())

    def fn(z):
        return exported.call(jnp.asarray(z, jnp.float32))

    return fn


def sample_masks(sampler_fn, nsubs: int, latent_size: int, seed: int = 777):
    """Reference-sampling semantics against a loaded sampler: re-seeded
    noise -> deterministic masks per (seed, nsubs)."""
    z = jax.random.normal(
        jax.random.PRNGKey(seed), (nsubs, latent_size), jnp.float32
    )
    return np.asarray(sampler_fn(z))


def _ensemble_score_fn(ensemble, max_batch: int = 4096):
    """The jittable ``x_test -> aggregated scores`` closure for a fitted
    native-base :class:`SubspaceEnsemble` (shared by the ensemble and
    heterogeneous exporters). Raises on non-native bases and on the
    bucketed aggregations, which cannot ride a chunk-reduced program.

    ``max_batch`` stands in for the symbolic test-batch dimension when the
    memory governors size the program (the live path clamps against the
    actual nt): when the train set exceeds ``STREAM_NTR`` for a neighbor
    base, the streamed tiles and the mask chunk are sized for serving
    batches up to ``max_batch``."""
    from vgan_tpu.ensemble.od import (
        _BASE_SCORERS,
        _DIM_BASES,
        _PARAM_BASES,
        _chunked_masks,
        _dim_ensemble_scores,
        _effective_chunk,
        _local_chunked_scores,
        _scorer_and_k,
        _scorer_params,
    )

    assert ensemble._x_train is not None, "fit the ensemble first"
    assert isinstance(ensemble.base, str) and ensemble.base in (
        *_BASE_SCORERS, *_DIM_BASES, *_PARAM_BASES,
    ), "only native base scorers export"
    if ensemble.aggregation not in ("average", "max", "weighted"):
        raise ValueError(
            f"aggregation={ensemble.aggregation!r} does not export: the "
            "serialized program reduces inside mask chunks, which cannot "
            "express the 'aom'/'moa'/'median' whole-pool combinations "
            "(nor 'vote', whose thresholds come from predict-time train "
            "batches) — export with aggregation='average'/'max'/"
            "'weighted', or use export_per_subspace_scorer and combine "
            "on the serving side"
        )
    x_train = ensemble._x_train

    # 'weighted' is 'average' over the ensemble's combining weights —
    # exactly how the live paths compile it (_reduce_aggregation)
    aggregation = ensemble._reduce_aggregation
    comb_proba = ensemble._combining_weights()

    if ensemble.base in _DIM_BASES:
        flat_masks = jnp.asarray(ensemble.subspaces, dtype=jnp.float32)
        flat_proba = jnp.asarray(comb_proba)

        def score(x_test):
            return _dim_ensemble_scores(
                x_test.astype(jnp.float32), x_train, flat_masks, flat_proba,
                base=ensemble.base, n_bins=ensemble.n_bins,
                aggregation=aggregation,
                normalize=ensemble.normalize,
            )
    else:
        scorer, k = _scorer_and_k(
            ensemble.base, **_scorer_params(ensemble),
        )
        chunk = _effective_chunk(
            ensemble.base, ensemble.chunk, max_batch,
            x_train.shape[0], x_train.shape[1], k=ensemble.k,
            n_clusters=ensemble.n_clusters,
            gmm_covariance=ensemble.gmm_covariance,
            n_trees=ensemble.n_trees, inne_psi=ensemble.inne_psi,
            kpca_sampling=ensemble.kpca_sampling,
            subset_size=ensemble.subset_size,
            mcd_starts=ensemble.mcd_starts,
            ae_hidden=ensemble.ae_hidden,
            sod_ref_set=ensemble.sod_ref_set,
        )
        masks_np, proba_np = _chunked_masks(
            ensemble.subspaces, comb_proba, chunk
        )
        masks = jnp.asarray(masks_np)
        proba = jnp.asarray(proba_np)

        def score(x_test):
            return _local_chunked_scores(
                x_test.astype(jnp.float32), x_train, masks, proba,
                scorer=scorer, k=k,
                aggregation=aggregation,
                normalize=ensemble.normalize,
            )

    if ensemble._jl_R is not None:
        # suod's JL stage: the member's working space is projected, so the
        # exported program takes ORIGINAL-d inputs and embeds the (d, m)
        # projection matmul in-graph
        inner = score
        jl_r = ensemble._jl_R

        def score(x_test):
            return inner(x_test.astype(jnp.float32) @ jl_r)

        return score, int(jl_r.shape[0])
    return score, x_train.shape[1]


def export_ensemble_scorer(ensemble, path, max_batch: int = 4096) -> None:
    """Serialize a fitted :class:`vgan_tpu.ensemble.SubspaceEnsemble`'s
    ``decision_function`` to ``path`` (StableHLO, symbolic test-batch dim).

    The training set, subspace masks, probabilities, and the base-scorer
    program are all embedded; a serving process needs only jax to score.
    When the train set exceeds the streaming threshold for a neighbor
    base, the program's memory governors are sized for serving batches up
    to ``max_batch`` (the symbolic batch has no concrete nt to clamp
    against; larger batches still run, with proportionally more memory).
    """
    score, d = _ensemble_score_fn(ensemble, max_batch=max_batch)
    batch = jax.export.symbolic_shape("b")[0]
    x_spec = jax.ShapeDtypeStruct((batch, d), jnp.float32)
    exported = jax.export.export(jax.jit(score))(x_spec)
    Path(path).write_bytes(exported.serialize())


def export_hetero_scorer(het, path, max_batch: int = 4096) -> None:
    """Serialize a fitted
    :class:`vgan_tpu.ensemble.HeterogeneousEnsemble`'s
    ``decision_function`` as ONE StableHLO program: every member's
    chunk-reduced subspace scores, the per-member batch standardization,
    and the 'average'/'max'/'median'/'select' combination all run in a single
    serialized graph (the 'select' reliability weights are computed
    in-program from the batch, exactly as the live path derives them).

    All members must use native base scorers and 'average'/'max'
    per-member aggregation (as for :func:`export_ensemble_scorer`); member ``mesh``
    settings don't apply to the serialized single-program path. The live
    path standardizes in float64 on host while the exported program runs
    float32 throughout — scores agree to ~1e-5 relative, not bitwise
    (the algorithm itself is the SAME code: `hetero._standardize` /
    `hetero._combine` with the jnp backend). One larger documented gap on
    TPU: a live knn/knn_mean member rides the fused Pallas kernel while
    the exported program uses the generic chunked path, whose Mosaic-vs-
    XLA numerics differ ~1e-3 relative (measured 4e-3 absolute on
    standardized scores) — the same live-vs-generic gap every fused-path
    consumer has.
    """
    from vgan_tpu.ensemble.hetero import _combine, _standardize

    member_fns = []
    d = None
    for i, m in enumerate(het.members):
        if i in het._distillers:
            # distilled member: the RFF-ridge regressor IS the member's
            # score function (two matmuls, original-space input) — suod's
            # approximation stage, serialized in-graph
            fn = het._distillers[i]._predict_jnp
            d_m = int(het._train_matrix().shape[1])
        else:
            fn, d_m = _ensemble_score_fn(m, max_batch=max_batch)
        member_fns.append(fn)
        assert d is None or d == d_m, (
            "members disagree on the ORIGINAL input dimension — JL "
            "members embed their projection, so every member fn takes "
            f"original-d input (got {d} vs {d_m})"
        )
        d = d_m
    combination = het.combination
    if combination == "vote":
        raise ValueError(
            "combination='vote' cannot be exported as one program: each "
            "member's labels come from its own predict-time train-batch "
            "thresholding. Export the members individually (or use "
            "export_per_subspace_scorer) and vote on the serving side."
        )
    weights = None if het.weights is None else jnp.asarray(
        het.weights, jnp.float32
    )

    def score(x_test):
        s = _standardize(
            jnp.stack([fn(x_test) for fn in member_fns]), xp=jnp
        )
        combined, _ = _combine(s, combination, xp=jnp, weights=weights)
        return combined

    batch = jax.export.symbolic_shape("b")[0]
    x_spec = jax.ShapeDtypeStruct((batch, d), jnp.float32)
    exported = jax.export.export(jax.jit(score))(x_spec)
    Path(path).write_bytes(exported.serialize())


def load_ensemble_scorer(path):
    """Load a serialized ensemble scorer; returns ``fn(x_test) -> scores``."""
    exported = jax.export.deserialize(Path(path).read_bytes())

    def fn(x_test):
        return np.asarray(exported.call(jnp.asarray(x_test, jnp.float32)))

    return fn


def export_per_subspace_scorer(ensemble, path, max_batch: int = 4096) -> None:
    """Serialize the RAW per-subspace score matrix program: ``x_test (b, d)
    -> (n_subspaces, b)`` (normalized per the ensemble's ``normalize``).

    The serving side applies whatever combination it wants — this is the
    export path for the bucketed 'aom'/'moa' modes (and for suod-style
    per-subspace analysis), which cannot ride the chunk-reduced
    ``export_ensemble_scorer`` program.
    """
    from vgan_tpu.ensemble.od import (
        _BASE_SCORERS,
        _DIM_BASES,
        _PARAM_BASES,
        _chunked_masks,
        _dim_scores_impl,
        _dim_subspace_raw,
        _effective_chunk,
        _per_subspace_chunked,
        _scorer_and_k,
        _scorer_params,
        _zscore,
    )

    assert ensemble._x_train is not None, "fit the ensemble first"
    assert isinstance(ensemble.base, str) and ensemble.base in (
        *_BASE_SCORERS, *_DIM_BASES, *_PARAM_BASES,
    ), "only native base scorers export"
    x_train = ensemble._x_train
    d = x_train.shape[1]
    n_subs = len(ensemble.subspaces)
    normalize = ensemble.normalize

    if ensemble.base in _DIM_BASES:
        flat_masks = jnp.asarray(ensemble.subspaces, dtype=jnp.float32)
        base, n_bins = ensemble.base, ensemble.n_bins

        def score(x_test):
            dim = _dim_scores_impl(
                x_test.astype(jnp.float32), x_train, base=base, n_bins=n_bins
            )
            s = _dim_subspace_raw(dim, flat_masks)
            if normalize == "zscore":
                s = _zscore(s)
            return s
    else:
        scorer, k = _scorer_and_k(
            ensemble.base, **_scorer_params(ensemble),
        )
        chunk = _effective_chunk(
            ensemble.base, ensemble.chunk, max_batch,
            x_train.shape[0], x_train.shape[1], k=ensemble.k,
            n_clusters=ensemble.n_clusters,
            gmm_covariance=ensemble.gmm_covariance,
            n_trees=ensemble.n_trees, inne_psi=ensemble.inne_psi,
            kpca_sampling=ensemble.kpca_sampling,
            subset_size=ensemble.subset_size,
            mcd_starts=ensemble.mcd_starts,
            ae_hidden=ensemble.ae_hidden,
            sod_ref_set=ensemble.sod_ref_set,
        )
        masks_np, _ = _chunked_masks(
            ensemble.subspaces, ensemble.proba, chunk
        )
        masks = jnp.asarray(masks_np)

        def score(x_test):
            raw = _per_subspace_chunked(
                x_test.astype(jnp.float32), x_train, masks, scorer=scorer, k=k
            )
            s = raw.reshape(-1, x_test.shape[0])[:n_subs]
            if normalize == "zscore":
                s = _zscore(s)
            return s

    batch = jax.export.symbolic_shape("b")[0]
    x_spec = jax.ShapeDtypeStruct((batch, d), jnp.float32)
    exported = jax.export.export(jax.jit(score))(x_spec)
    Path(path).write_bytes(exported.serialize())
