"""Heterogeneous detector combination over one subspace pool (suod-style).

The reference's experiment stack pins suod==0.1.3 and sel_suod==0.1
(requirements.txt:68,73) — frameworks for training and combining a LARGE
HETEROGENEOUS collection of base detectors. Here the analogous capability:
several :class:`~vgan_tpu.ensemble.od.SubspaceEnsemble` members (each its
own base family + hyperparameters) score the SAME V-GAN subspace pool, each
member's aggregated scores are standardized over the test batch (suod's
score-alignment step — knn distances and -log ECDF tails live on
incomparable scales), and the standardized member scores combine by
'average' or 'max' (pyod/combo's two canonical combinators).

suod's three acceleration stages are all covered: per-detector JL random
projection (a member dict with ``jl_dim=`` — see
``SubspaceEnsemble(jl_dim=...)``), balanced scheduling (the ``mesh=``
sharding paths), and pseudo-supervised approximation (:meth:`distill` —
an RFF-ridge regressor per member replaces the detector at inference).

Every member rides its own fast path (fused Pallas KNN kernel, dim-base
matmuls, shard_map over ``mesh=``) — heterogeneity costs one extra
standardize+reduce, not a Python loop over detectors.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from vgan_tpu.ensemble.od import (
    PyodSurfaceMixin, SubspaceEnsemble, _POSITIONAL_EXCL_BASES,
)


def _standardize(s, xp=np):
    """Per-member standardization over the test batch (suod's
    score-alignment step). ``xp`` is the array backend — numpy on the live
    path, jax.numpy inside the exported program — so the algorithm exists
    ONCE for both."""
    mu = xp.mean(s, axis=1, keepdims=True)
    sd = xp.std(s, axis=1, keepdims=True) + 1e-12
    return (s - mu) / sd


def _combine(s, combination: str, xp=np, weights=None):
    """Combine STANDARDIZED member scores ``s (n_members, nt)``.

    Returns ``(combined (nt,), weights_or_None)``; 'select' derives the
    consensus-correlation reliability weights (see the class docstring),
    'weighted' applies the user-supplied ``weights`` (combo's
    weighted-average combinator — normalized here so callers can pass raw
    importances). Single implementation shared by the live numpy path and
    the traced jnp program in :func:`vgan_tpu.serving.export_hetero_scorer`
    — keep backend-agnostic (no in-place ops, no data-dependent Python
    control flow on array values).
    """
    if combination == "max":
        return xp.max(s, axis=0), None
    if combination == "median":
        return xp.median(s, axis=0), None
    if combination == "weighted":
        w = xp.asarray(weights, s.dtype)
        w = w / xp.sum(w)
        return w @ s, w
    if combination == "select":
        consensus = xp.mean(s, axis=0)
        consensus = (consensus - xp.mean(consensus)) / (
            xp.std(consensus) + 1e-12
        )
        corr = xp.mean(s * consensus[None, :], axis=1)
        w = xp.clip(corr, 0.0, None)
        total = xp.sum(w)
        n = s.shape[0]
        uniform = xp.full((n,), 1.0 / n, s.dtype)
        # anti-correlated members clip to 0; all-zero clips fall back to
        # uniform (== 'average')
        w = xp.where(total > 0, w / xp.maximum(total, 1e-30), uniform)
        return w @ s, w
    return xp.mean(s, axis=0), None


class HeterogeneousEnsemble(PyodSurfaceMixin):
    """Combine several base-detector families over one subspace pool.

    Parameters
    ----------
    subspaces, proba:
        the shared mask pool + probabilities (as for ``SubspaceEnsemble``).
    members:
        sequence of kwargs dicts, one per member — each builds a
        ``SubspaceEnsemble(subspaces, proba, **shared, **member)``. E.g.
        ``[{"base": "knn", "k": 10}, {"base": "lof", "k": 20},
        {"base": "ecod"}]``. A member dict may carry its OWN
        ``subspaces``/``proba`` to score a different pool (suod-style —
        e.g. a learned-pool member combined with a
        :func:`~vgan_tpu.ensemble.od.random_subspaces` feature-bagging
        member). A member with ``jl_dim=m`` works in its own JL-projected
        space (suod's projection stage); without an explicit pool it
        scores the full projected space.
    combination:
        'average' (mean of standardized member scores), 'max'
        (suod/combo's maximization combinator), 'median' (combo's median
        combination, robust to one broken member), or 'select' —
        a sel_suod-inspired reliability weighting: members are weighted
        by their Pearson correlation to the consensus (the mean of the
        standardized member scores), clipped at zero and renormalized,
        so a member that disagrees with the ensemble consensus (noisy or
        broken on this data) is automatically downweighted. (The SELECT
        family of Rayana & Akoglu 2016 builds pseudo-ground-truth from
        detector consensus the same way; the reference pins the author's
        sel_suod==0.1 at requirements.txt:73 for this capability.) The
        fitted weights of the LAST scoring call are exposed as
        ``member_weights_``; falls back to 'average' when every
        correlation clips to zero. Two further combo combinators
        (requirements.txt:6 capability surface): 'weighted' — combo's
        weighted-average with explicit per-member ``weights`` — and
        'vote' — combo's majority_vote over the members' own 0/1 labels
        (``decision_function`` returns the weighted vote fraction,
        ``predict`` the strict-majority label).
    weights:
        per-member combination weights (non-negative, normalized
        internally). REQUIRED for 'weighted'; optional for 'vote'
        (uniform default); ignored by the other modes.
    contamination:
        expected outlier fraction for ``predict`` (pyod semantics, as in
        ``SubspaceEnsemble``).
    **shared:
        kwargs applied to every member (e.g. ``mesh=``, ``aggregation=``,
        ``chunk=``); member dicts override.
    """

    def __init__(
        self,
        subspaces: np.ndarray,
        proba: np.ndarray,
        members: Sequence[dict] = (
            {"base": "knn"}, {"base": "lof"}, {"base": "ecod"},
        ),
        combination: str = "average",
        contamination: float = 0.1,
        weights: Optional[Sequence[float]] = None,
        **shared,
    ):
        if combination not in (
            "average", "max", "median", "select", "weighted", "vote",
        ):
            raise ValueError(
                f"unknown combination={combination!r}: expected 'average', "
                "'max', 'median', 'select', 'weighted', or 'vote'"
            )
        if not members:
            raise ValueError("members must be non-empty")
        if combination == "weighted" and weights is None:
            raise ValueError(
                "combination='weighted' needs explicit weights= (combo's "
                "weighted-average combinator); use 'average' for uniform "
                "or 'select' for data-derived weights"
            )
        if weights is not None:
            weights = np.asarray(weights, np.float64)
            if len(weights) != len(members):
                raise ValueError(
                    f"weights and members disagree: {len(weights)} weights "
                    f"vs {len(members)} members"
                )
            if np.any(weights < 0) or not weights.sum() > 0:
                raise ValueError(
                    "weights must be non-negative with a positive sum"
                )
        self.weights = weights
        self.members = []
        for m in members:
            kwargs = {**shared, **m}
            # a member may bring its OWN pool (suod trains different
            # detectors on different projections) — e.g. mix a learned-
            # pool member with a random_subspaces feature-bagging member.
            # Pools come as a PAIR: one without the other would silently
            # pair masks with the shared pool's probabilities.
            if ("subspaces" in kwargs) != ("proba" in kwargs):
                raise ValueError(
                    "a member overriding the pool must carry BOTH "
                    f"'subspaces' and 'proba'; got only one in {m!r}"
                )
            if kwargs.get("jl_dim") is not None and "subspaces" not in kwargs:
                # suod's JL stage scores the full PROJECTED space; a JL
                # member without an explicit pool gets the single all-ones
                # mask over the projected dims (a custom pool must live in
                # projected coordinates — SubspaceEnsemble validates)
                kwargs["subspaces"] = np.ones(
                    (1, int(kwargs["jl_dim"])), bool
                )
                kwargs["proba"] = np.ones(1, np.float32)
            m_subs = kwargs.pop("subspaces", subspaces)
            m_proba = kwargs.pop("proba", proba)
            self.members.append(
                SubspaceEnsemble(m_subs, m_proba, **kwargs)
            )
        self.combination = combination
        self.contamination = contamination
        self._threshold = None
        self._member_weights = None
        self._decision_scores = None
        self._x_train_orig = None
        self._distillers = {}

    @classmethod
    def from_model(cls, model, subspace_count: int = 500, **kwargs):
        """Build from a fitted estimator via ``approx_subspace_dist``."""
        model.approx_subspace_dist(subspace_count)
        return cls(model.subspaces, model.proba, **kwargs)

    def fit(self, x_train: np.ndarray):
        self._x_train_orig = np.asarray(x_train, np.float32)
        for m in self.members:
            m.fit(x_train)
        self._decision_scores = None
        self._distillers = {}
        return self

    def _train_matrix(self) -> np.ndarray:
        # the ORIGINAL-space train matrix: a member may work in its own
        # JL-projected space, so members[0]._x_train is not a safe proxy
        assert self._x_train_orig is not None, "call fit(X_train) first"
        return self._x_train_orig

    def _calibration_scores(self, x_test: np.ndarray):
        """``predict_proba`` calibration via ONE combined train+test pass.

        Member scores are standardized per batch (suod's alignment step),
        so scoring train and test separately would calibrate against
        incomparable scales — an outlier-only test batch would be
        standardized to look like the train distribution. Scoring the
        combined batch (the same one-batch design ``predict`` documents)
        puts both on shared member statistics; neighbor members exclude
        the train rows' self-pairs.

        'vote' members threshold internally per ``predict`` call, so the
        vote fractions are computed per split directly (no shared-batch
        standardization to preserve)."""
        if self.combination == "vote":
            x_train = self._train_matrix()
            return (
                self.decision_function(x_train),
                self.decision_function(np.asarray(x_test, np.float32)),
            )
        x_train = self._train_matrix()
        n_tr = len(x_train)
        both = np.concatenate([x_train, np.asarray(x_test, np.float32)])
        scores = self.decision_function(both, exclude_self=True)
        return scores[:n_tr], scores[n_tr:]

    def distill(self, members=None, n_features: int = 512,
                ridge="gcv", seed: int = 0):
        """suod's pseudo-supervised approximation stage: fit a fast
        supervised regressor per member on ``(X_train -> member's train
        scores)`` and serve the regressor instead of the detector — a
        distilled member's inference is two matmuls regardless of its
        base family's cost (and, unlike suod's RandomForestRegressor, it
        serializes into the exported StableHLO program — see
        :class:`vgan_tpu.ensemble.distill.ScoreDistiller`).

        ``members`` selects which member indices to distill (default:
        all). Train scores are the member's own ``decision_function`` on
        the ORIGINAL-space train matrix with neighbor self-pairs excluded
        (pyod's fit-score semantics; the approximator itself has no
        self-pair concept — suod's has the same property). Call after
        ``fit``; refit clears distillers. Returns self."""
        from vgan_tpu.ensemble.distill import ScoreDistiller

        x_tr = self._train_matrix()
        idxs = range(len(self.members)) if members is None else members
        for i in idxs:
            m = self.members[i]
            neighbor = isinstance(m.base, str) and (
                m.base in _POSITIONAL_EXCL_BASES
            )
            s_tr = np.asarray(
                m.decision_function(x_tr, exclude_self=neighbor),
                np.float64,
            )
            self._distillers[int(i)] = ScoreDistiller(
                n_features=n_features, ridge=ridge, seed=seed + int(i),
            ).fit(x_tr, s_tr)
        return self

    @property
    def distilled_members_(self):
        """Sorted indices of the currently distilled members."""
        return sorted(self._distillers)

    def member_scores(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """(n_members, nt) standardized member scores. ``exclude_self``
        reaches the neighbor-based members only (distribution-based bases
        ignore it, as in ``SubspaceEnsemble.decision_function``).
        Distilled members (see :meth:`distill`) score through their
        regressor — original-space input, no exclude_self concept."""
        rows = []
        for i, m in enumerate(self.members):
            if i in self._distillers:
                s = self._distillers[i].predict(
                    np.asarray(x_test, np.float32)
                )
            else:
                neighbor = (
                    isinstance(m.base, str)
                    and m.base in _POSITIONAL_EXCL_BASES
                )
                s = m.decision_function(
                    x_test, exclude_self=exclude_self and neighbor
                )
            rows.append(np.asarray(s, np.float64))
        return _standardize(np.stack(rows)).astype(np.float32)

    def decision_function(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """Combined outlier scores (higher = more outlying).

        With ``combination='vote'`` the score is the weighted FRACTION of
        members whose own ``predict`` flags the point (combo's
        majority-vote combinator lifted to a [0, 1] score; each member
        thresholds at its own contamination quantile with its documented
        one-batch semantics, so ``exclude_self`` is internal there)."""
        if self.combination == "vote":
            labels = np.stack([
                self._member_labels(i, x_test) for i in range(
                    len(self.members)
                )
            ])
            w = (
                np.full(len(self.members), 1.0 / len(self.members))
                if self.weights is None else self.weights / self.weights.sum()
            )
            return (w @ labels).astype(np.float32)
        s = self.member_scores(x_test, exclude_self=exclude_self)
        combined, w = _combine(
            s.astype(np.float64), self.combination, weights=self.weights,
        )
        if self.combination == "select":
            self._member_weights = w.astype(np.float32)
        return combined.astype(np.float32)

    def _member_labels(self, i: int, x_test: np.ndarray) -> np.ndarray:
        """One member's 0/1 vote: its own ``predict``, or — when distilled
        — the regressor's scores thresholded at the (1 - contamination)
        quantile of the regressor's TRAIN scores (the distilled analogue
        of pyod's fit-time threshold)."""
        m = self.members[i]
        if i not in self._distillers:
            return m.predict(x_test).astype(np.float64)
        dist = self._distillers[i]
        s_tr = dist.predict(self._train_matrix())
        thr = np.quantile(s_tr, 1.0 - self.contamination)
        s_te = dist.predict(np.asarray(x_test, np.float32))
        return (s_te > thr).astype(np.float64)

    @property
    def member_weights_(self) -> Optional[np.ndarray]:
        """Reliability weights from the last 'select' scoring call (one per
        member, summing to 1), or None before scoring / for other modes."""
        return self._member_weights

    def predict(self, x_test: np.ndarray) -> np.ndarray:
        """0/1 labels at the (1 - contamination) train-score quantile.

        Same one-batch semantics as ``SubspaceEnsemble.predict`` (scores
        train+test together so the member standardization is shared;
        ``threshold_`` is recomputed per call — see that class's
        documented divergence from pyod's fit-time threshold).

        With ``combination='vote'``: strict weighted majority of the
        members' own labels (combo's majority_vote; a tie is an inlier —
        combo's argmax-on-counts picks label 0 there too).
        """
        if self.combination == "vote":
            frac = self.decision_function(x_test)
            self._threshold = 0.5
            return (frac > 0.5).astype(np.int64)
        x_train = self.members[0]._x_train
        assert x_train is not None, "call fit(X_train) first"
        x_train = np.asarray(x_train)
        n_tr = len(x_train)
        both = np.concatenate([x_train, np.asarray(x_test, np.float32)])
        scores = self.decision_function(both, exclude_self=True)
        self._threshold = float(
            np.quantile(scores[:n_tr], 1.0 - self.contamination)
        )
        return (scores[n_tr:] > self._threshold).astype(np.int64)

    @property
    def threshold_(self) -> Optional[float]:
        """Train-score threshold from the last ``predict`` call."""
        return self._threshold
