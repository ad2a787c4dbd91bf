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
the fit is one (F, F) Gram + Cholesky solve, and inference is two matmuls
— the whole predict path rides the MXU and serializes into the StableHLO
serving programs (suod's RF cannot). Closed-form, deterministic, no
training loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_features",))
def _rff_features(x, w, b, *, n_features):
    """sqrt(2/F) * cos(x @ W + b) — the RFF map for the RBF kernel."""
    z = x @ w + b[None, :]
    return jnp.cos(z) * np.sqrt(2.0 / n_features)


@functools.partial(jax.jit, static_argnames=("n_features",))
def _rff_fit(x, y, w, b, ridge, *, n_features):
    """Closed-form ridge solve in feature space: (Z'Z + r n I) beta = Z'y.

    f64 normal equations: the (F, F) Gram is tiny (F <= a few thousand)
    and f32 normal equations square the condition number."""
    z = _rff_features(x, w, b, n_features=n_features).astype(jnp.float64)
    y = y.astype(jnp.float64)
    n = x.shape[0]
    gram = z.T @ z + ridge * n * jnp.eye(n_features, dtype=jnp.float64)
    chol = jax.scipy.linalg.cho_factor(gram, lower=True)
    beta = jax.scipy.linalg.cho_solve(chol, z.T @ y)
    return beta.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_features",))
def _rff_predict(x, w, b, beta, *, n_features):
    return _rff_features(x, w, b, n_features=n_features) @ beta


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
        random Fourier feature count F (capacity; fit cost is one (F, F)
        Cholesky).
    lengthscale:
        RBF kernel lengthscale; 'median' (default) uses the median
        pairwise distance of a <=1024-row train subsample — the standard
        bandwidth heuristic — or pass a float.
    ridge:
        ridge regularizer (scaled by n internally).
    seed:
        random feature draw (W, b) — deterministic distillers.

    ``fit`` standardizes inputs per-dimension and targets to zero
    mean / unit variance (scores from different base families live on
    wildly different scales); ``predict`` undoes the target transform.
    """

    def __init__(self, n_features: int = 256, lengthscale="median",
                 ridge: float = 1e-4, seed: int = 0):
        if n_features < 1:
            raise ValueError(f"n_features must be >= 1; got {n_features}")
        if not ridge > 0:
            raise ValueError(f"ridge must be positive; got {ridge}")
        self.n_features = int(n_features)
        self.lengthscale = lengthscale
        self.ridge = float(ridge)
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
        w = rng.normal(0.0, 1.0 / ls, size=(x.shape[1], self.n_features))
        b = rng.uniform(0.0, 2.0 * np.pi, size=self.n_features)
        w = jnp.asarray(w, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        beta = _rff_fit(
            jnp.asarray(xs), jnp.asarray(ys), w, b, self.ridge,
            n_features=self.n_features,
        )
        self._params = dict(
            w=w, b=b, beta=beta,
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
            xs, p["w"], p["b"], p["beta"], n_features=self.n_features
        )
        return ys * p["y_sd"] + p["y_mu"]
