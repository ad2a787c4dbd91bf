"""Pseudo-supervised score approximation (suod's distillation stage).

The reference's experiment stack pins suod==0.1.3
(/root/reference/requirements.txt:68), whose acceleration pipeline has
three stages: per-detector dimensionality reduction (JL random projection
— see ``SubspaceEnsemble(jl_dim=...)``), balanced scheduling (the mesh
sharding paths), and *pseudo-supervised approximation*: after fitting an
expensive unsupervised detector, train a fast supervised regressor on
``(X_train -> detector's train scores)`` and serve the regressor instead
of the detector.

suod uses a RandomForestRegressor there. Branchy trees are a poor fit for
the MXU, so the TPU-native distiller is a **random-Fourier-feature ridge
regression** (Rahimi & Recht 2007): the feature map is one matmul + cos,
the fit is one (F, F) eigendecomposition, and inference is two matmuls —
the whole predict path rides the MXU and serializes into the StableHLO
serving programs (suod's RF cannot). Closed-form, deterministic, no
training loop.

Three measured upgrades over the naive single-bandwidth RFF ridge (the
round-5 suod-stages eval caught test-score Pearson r ~ 0.33 on the
bc+200nz hetero teachers — a badly generalizing isotropic kernel, not an
inherent limit):

- **multi-scale features**: the RFF block is split evenly across
  ``scales`` x the median lengthscale — the median heuristic routinely
  misses the right bandwidth on noise-diluted high-d data, and mixing
  scales is the standard closed-form fix;
- **linear augmentation**: the standardized inputs (scaled 1/sqrt(d))
  are appended to the feature block — detector scores have strong
  monotone components the cosine features waste capacity on;
- **GCV ridge selection**: ``ridge='gcv'`` (default) picks the ridge
  from a small grid by generalized cross-validation, closed-form via
  ONE (F, F) eigendecomposition shared across the grid (trace of the
  hat matrix is sum s_i / (s_i + r n)).

On the proxy teachers (knn subspace-ensemble scores, bc+200nz) these
move test Pearson r from ~0.33 to ~0.74 with GCV landing within noise
of the best grid point (and the easy smooth-teacher cases do not
regress: held-out spearman 0.97).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# GCV grid for ridge='gcv' (scaled by n internally, like explicit ridges)
_GCV_RIDGES = (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1)


@functools.partial(jax.jit, static_argnames=("n_cos",))
def _rff_features(x, w, b, *, n_cos):
    """[sqrt(2/F_cos) cos(x @ W + b), x / sqrt(d)] — the multi-scale RFF
    map with the linear augmentation block. ``W`` already carries the
    per-scale bandwidths in its columns."""
    z = jnp.cos(x @ w + b[None, :]) * np.sqrt(2.0 / n_cos)
    lin = x / np.sqrt(x.shape[1])
    return jnp.concatenate([z, lin], axis=1)


@functools.partial(jax.jit, static_argnames=("n_cos",))
def _rff_fit_gcv(x, y, w, b, ridges, *, n_cos):
    """Closed-form ridge solves over a ridge grid + GCV scores.

    f64 normal equations through ONE (F, F) eigendecomposition: for each
    ridge r, beta_r = V diag(1/(s + r n)) V' Z'y, the hat-matrix trace is
    sum_i s_i / (s_i + r n), and GCV(r) = mean((y - Z beta)^2) /
    (1 - tr(H)/n)^2. The Gram is tiny (F <= a few thousand) and f32
    normal equations square the condition number, hence f64."""
    z = _rff_features(x, w, b, n_cos=n_cos).astype(jnp.float64)
    y = y.astype(jnp.float64)
    n = x.shape[0]
    gram = z.T @ z
    s, v = jnp.linalg.eigh(gram)
    s = jnp.maximum(s, 0.0)
    c = v.T @ (z.T @ y)

    def one(r):
        beta = v @ (c / (s + r * n))
        resid = y - z @ beta
        eff = jnp.sum(s / (s + r * n))
        gcv = jnp.mean(resid * resid) / jnp.square(1.0 - eff / n)
        return beta, gcv

    betas, gcvs = jax.vmap(one)(ridges)
    return betas.astype(jnp.float32), gcvs


@functools.partial(jax.jit, static_argnames=("n_cos",))
def _rff_predict(x, w, b, beta, *, n_cos):
    return _rff_features(x, w, b, n_cos=n_cos) @ beta


@jax.jit
def _median_sq_dist(x):
    """Median pairwise squared distance (the RBF lengthscale heuristic) —
    one Gram matmul on a bounded subsample."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    n = x.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    vals = jnp.where(off, jnp.maximum(d2, 0.0), jnp.nan)
    return jnp.nanmedian(vals)


class ScoreDistiller:
    """Fast supervised approximation of one detector's score function.

    Parameters
    ----------
    n_features:
        random Fourier feature count F (the cosine block; the linear
        augmentation adds d more). Fit cost is one (F + d, F + d)
        eigendecomposition.
    lengthscale:
        RBF kernel base lengthscale; 'median' (default) uses the median
        pairwise distance of a <=1024-row train subsample — the standard
        bandwidth heuristic — or pass a float. The cosine block is split
        evenly across ``scales`` x this base.
    scales:
        bandwidth multipliers for the multi-scale cosine block.
    ridge:
        ridge regularizer (scaled by n internally), or 'gcv' (default):
        pick from a small grid by generalized cross-validation,
        closed-form (see module docstring). ``ridge_`` records the
        selected value after ``fit``.
    seed:
        random feature draw (W, b) — deterministic distillers.

    ``fit`` standardizes inputs per-dimension and targets to zero
    mean / unit variance (scores from different base families live on
    wildly different scales); ``predict`` undoes the target transform.
    """

    def __init__(self, n_features: int = 512, lengthscale="median",
                 scales=(0.5, 1.0, 2.0, 4.0), ridge="gcv", seed: int = 0):
        if n_features < 1:
            raise ValueError(f"n_features must be >= 1; got {n_features}")
        if ridge != "gcv" and not (
            isinstance(ridge, (int, float)) and ridge > 0
        ):
            raise ValueError(
                f"ridge must be positive or 'gcv'; got {ridge!r}"
            )
        scales = tuple(float(s) for s in scales)
        if not scales or not all(s > 0 for s in scales):
            raise ValueError(
                f"scales must be a non-empty tuple of positive bandwidth "
                f"multipliers; got {scales!r}"
            )
        self.n_features = int(n_features)
        self.lengthscale = lengthscale
        self.scales = scales
        self.ridge = ridge if ridge == "gcv" else float(ridge)
        self.ridge_ = None
        self.seed = int(seed)
        self._params = None

    def fit(self, x: np.ndarray, scores: np.ndarray):
        x = np.asarray(x, np.float32)
        y = np.asarray(scores, np.float32)
        if x.ndim != 2 or len(x) != len(y):
            raise ValueError(
                f"x (n, d) and scores (n,) disagree: {x.shape} vs {y.shape}"
            )
        mu = x.mean(axis=0)
        sd = x.std(axis=0) + 1e-9
        xs = (x - mu) / sd
        y_mu = float(y.mean())
        y_sd = float(y.std()) + 1e-12
        ys = (y - y_mu) / y_sd

        if self.lengthscale == "median":
            sub = xs[:: max(1, len(xs) // 1024)][:1024]
            med = float(_median_sq_dist(jnp.asarray(sub)))
            ls = float(np.sqrt(max(med, 1e-12)))
        else:
            ls = float(self.lengthscale)
        rng = np.random.default_rng(self.seed)
        # multi-scale cosine block: n_features columns split evenly across
        # the bandwidth multipliers (remainder goes to the last scale)
        per = self.n_features // len(self.scales)
        counts = [per] * (len(self.scales) - 1)
        counts.append(self.n_features - per * (len(self.scales) - 1))
        w = np.concatenate([
            rng.normal(0.0, 1.0 / (ls * s), size=(x.shape[1], c))
            for s, c in zip(self.scales, counts)
        ], axis=1)
        b = rng.uniform(0.0, 2.0 * np.pi, size=self.n_features)
        w = jnp.asarray(w, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        ridges = (
            _GCV_RIDGES if self.ridge == "gcv" else (float(self.ridge),)
        )
        betas, gcvs = _rff_fit_gcv(
            jnp.asarray(xs), jnp.asarray(ys), w, b,
            jnp.asarray(ridges, jnp.float64), n_cos=self.n_features,
        )
        pick = int(np.argmin(np.asarray(gcvs)))
        self.ridge_ = float(ridges[pick])
        self._params = dict(
            w=w, b=b, beta=betas[pick],
            x_mu=jnp.asarray(mu), x_sd=jnp.asarray(sd),
            y_mu=y_mu, y_sd=y_sd,
        )
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        assert self._params is not None, "call fit(x, scores) first"
        return np.asarray(self._predict_jnp(jnp.asarray(x, jnp.float32)))

    def _predict_jnp(self, x):
        """Traced predict (jnp in/out) — the closure the serving exporter
        embeds; parameters are captured as jnp constants."""
        p = self._params
        assert p is not None, "call fit(x, scores) first"
        xs = (x - p["x_mu"][None, :]) / p["x_sd"][None, :]
        ys = _rff_predict(
            xs, p["w"], p["b"], p["beta"], n_cos=self.n_features
        )
        return ys * p["y_sd"] + p["y_mu"]
