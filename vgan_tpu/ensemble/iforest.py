"""Subspace-aware isolation forest, TPU-native (jit/vmap, no recursion).

The reference's experiment branches drive pyod detectors (IForest among
them) over sampled subspaces (README.md:56-60; requirements.txt:58 pins
pyod). pyod's IForest wraps sklearn's recursive tree builder — unusable
under jit. This module rebuilds the iForest algorithm (Liu et al. 2008)
with static shapes:

- **fit, level-wise**: a tree is L = ceil(log2(psi)) parallel levels. Every
  subsampled point carries a node id; per level, each node draws a split
  feature (uniform over the subspace mask's selected features) and a
  threshold uniform in the node's [min, max] of that feature (segment
  min/max over node ids), then ids advance ``2 id + (v > t)``. All trees
  build in one vmap — no per-node Python.
- **score, static traversal**: descend L gather steps; a point terminates
  at the first level where its training node held <= 1 points (external
  node), with the standard ``c(size)`` correction at the depth cap.
  ``score = 2 ** (-E_trees[h(x)] / c(psi))`` — higher = more anomalous,
  matching sklearn/pyod conventions up to their sign/offset.

Randomness is derived from a fixed key, shared across subspace masks (each
mask induces different feature draws, so trees differ per subspace); pass
``key`` for independent ensembles.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PSI = 256


def _c_factor(s: jax.Array) -> jax.Array:
    """Average unsuccessful-BST-search path length c(s); c(s<=1) = 0."""
    s = s.astype(jnp.float32)
    euler = 0.5772156649
    big = 2.0 * (jnp.log(jnp.maximum(s - 1.0, 1.0)) + euler) - 2.0 * (
        jnp.maximum(s - 1.0, 0.0) / jnp.maximum(s, 1.0)
    )
    return jnp.where(s > 2.0, big, jnp.where(s == 2.0, 1.0, 0.0))


def _node_onehot(node, n_nodes: int):
    return (
        node[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (node.shape[0], n_nodes), 1)
    ).astype(jnp.float32)


def _fit_tree(key, x_train, logits, psi: int, depth: int):
    """One tree: per-level (feature-onehot, threshold, node-size) tables.

    Entirely gather/scatter-free: node membership is a one-hot matrix, so
    per-node reductions are masked min/max and per-point table lookups are
    (points, nodes) @ (nodes, .) matmuls — the forms the MXU/VPU like.
    """
    n, d = x_train.shape
    k_sub, k_feat, k_thr = jax.random.split(key, 3)
    idx = jax.random.choice(k_sub, n, (psi,), replace=psi > n)
    xs = x_train[idx]

    node = jnp.zeros((psi,), jnp.int32)
    feat_ohs, thrs, sizes = [], [], []
    inf = jnp.asarray(jnp.inf, jnp.float32)
    for level in range(depth):
        n_nodes = 2**level
        f_l = jax.random.categorical(
            jax.random.fold_in(k_feat, level),
            jnp.broadcast_to(logits, (n_nodes, d)),
        )  # (n_nodes,) split feature per node
        f_oh = (
            f_l[:, None] == jax.lax.broadcasted_iota(jnp.int32, (n_nodes, d), 1)
        ).astype(jnp.float32)
        onehot = _node_onehot(node, n_nodes)
        # v[i] = xs[i, feature(node_i)] as two matmuls, no gathers
        v = jnp.sum(
            xs * jnp.dot(onehot, f_oh, preferred_element_type=jnp.float32),
            axis=1,
        )
        ob = onehot > 0
        mins = jnp.min(jnp.where(ob, v[:, None], inf), axis=0)
        maxs = jnp.max(jnp.where(ob, v[:, None], -inf), axis=0)
        sz = jnp.sum(onehot, axis=0)
        u = jax.random.uniform(jax.random.fold_in(k_thr, level), (n_nodes,))
        # empty nodes would give inf + u*(-inf) = NaN, and the one-hot
        # matmul lookup would poison EVERY point at the level (0*NaN=NaN):
        # zero their thresholds (no training point routes there; test
        # points terminate on sz==0 before using them)
        t_l = jnp.where(sz > 0, mins + u * (maxs - mins), 0.0)
        feat_ohs.append(f_oh)
        thrs.append(t_l)
        sizes.append(sz)
        t_pt = jnp.dot(onehot, t_l, preferred_element_type=jnp.float32)
        node = 2 * node + (v > t_pt).astype(jnp.int32)
    final_sizes = jnp.sum(_node_onehot(node, 2**depth), axis=0)
    return tuple(feat_ohs), tuple(thrs), tuple(sizes), final_sizes


def _score_tree(tree, x_test, depth: int):
    """Per-point path length h(x) through one fitted tree (gather-free)."""
    feat_ohs, thrs, sizes, final_sizes = tree
    nt = x_test.shape[0]
    node = jnp.zeros((nt,), jnp.int32)
    h = jnp.zeros((nt,), jnp.float32)
    alive = jnp.ones((nt,), bool)
    for level in range(depth):
        onehot = _node_onehot(node, 2**level)
        sz = jnp.dot(onehot, sizes[level], preferred_element_type=jnp.float32)
        # external node reached: <=1 training points (0 = empty region)
        terminate = alive & (sz <= 1.0)
        h = jnp.where(terminate, float(level) + _c_factor(sz), h)
        alive = alive & ~terminate
        v = jnp.sum(
            x_test
            * jnp.dot(onehot, feat_ohs[level],
                      preferred_element_type=jnp.float32),
            axis=1,
        )
        t_pt = jnp.dot(onehot, thrs[level], preferred_element_type=jnp.float32)
        node = 2 * node + (v > t_pt).astype(jnp.int32)
    final_sz = jnp.dot(
        _node_onehot(node, final_sizes.shape[0]), final_sizes,
        preferred_element_type=jnp.float32,
    )
    h = jnp.where(alive, float(depth) + _c_factor(final_sz), h)
    return h


@partial(jax.jit, static_argnames=("n_trees", "psi", "depth"))
def _iforest_impl(x_test, x_train, mask, key, n_trees, psi, depth):
    mask_f = mask.astype(jnp.float32)
    logits = jnp.where(mask_f > 0, 0.0, -jnp.inf)
    xt = x_train.astype(jnp.float32)
    xe = x_test.astype(jnp.float32)
    tree_keys = jax.random.split(key, n_trees)
    trees = jax.vmap(
        lambda k: _fit_tree(k, xt, logits, psi, depth)
    )(tree_keys)
    hs = jax.vmap(lambda tree: _score_tree(tree, xe, depth))(trees)
    e_h = jnp.mean(hs, axis=0)
    return jnp.exp2(-e_h / _c_factor(jnp.asarray(float(psi))))


def iforest_scores_masked(
    x_test: jax.Array,
    x_train: jax.Array,
    mask: jax.Array,
    n_trees: int = 100,
    psi: int = DEFAULT_PSI,
    key: jax.Array = None,
) -> jax.Array:
    """Isolation-forest anomaly scores in the masked feature space.

    Returns (nt,) scores in (0, 1]; higher = more anomalous. Matches the
    SubspaceEnsemble scorer signature via the od-module wrapper.
    """
    psi = min(psi, int(x_train.shape[0]))
    depth = max(1, math.ceil(math.log2(psi)))
    if key is None:
        key = jax.random.PRNGKey(0)
    return _iforest_impl(
        x_test, x_train, mask, key, int(n_trees), int(psi), int(depth)
    )


def iforest_scores(x_test, x_train, n_trees: int = 100, psi: int = DEFAULT_PSI,
                   key=None) -> np.ndarray:
    """Full-space isolation forest (all features selected)."""
    mask = jnp.ones((x_train.shape[1],), bool)
    return np.asarray(
        iforest_scores_masked(
            jnp.asarray(np.asarray(x_test), jnp.float32),
            jnp.asarray(np.asarray(x_train), jnp.float32),
            mask, n_trees=n_trees, psi=psi, key=key,
        )
    )
