"""Subspace-ensemble outlier detection: vmap-batched scoring over masks.

The reference's downstream capability (README.md:56-60 and the pyod/suod/
sel_suod pins at requirements.txt:58,68,73): sample many subspace masks from
a trained V-GAN, project the data through each, score with a base outlier
detector, and aggregate — the "subspace-ensemble" workflow of the paper
(arXiv:2504.07522). The reference drives pyod estimators in a Python loop
per subspace; here the whole ensemble runs as ONE jitted program: masked
distances are computed with the matmul identity

    d2_m(a, b) = (a*a) @ m + (b*b) @ m - 2 (a .* m) @ b^T

so each subspace's distance matrix is a batched MXU matmul, ``vmap`` batches
over thousands of masks, and ``lax.map`` chunks the mask axis to bound
memory. Base detectors implemented natively (KNN k-th-distance, KNN mean
distance, LOF, ABOD, COF, isolation forest, Mahalanobis, MCD, PCA, KPCA,
CBLOF, GMM, LODA, KDE, INNE, Sampling, SOS, LMDD, a trained-in-program
AutoEncoder, Deep SVDD, SOD,
an in-program one-class SVM (exact libsvm dual via projected FISTA),
and the dim-decomposable
COPOD/HBOS/ECOD); a pyod adapter covers arbitrary CPU
detectors for parity checks when pyod is installed (it is NOT a
dependency).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def _masked_sq_dists(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """(nt, ntr) squared distances restricted to masked features."""
    mask = mask.astype(a.dtype)
    an = jnp.dot(a * a, mask)
    bn = jnp.dot(b * b, mask)
    cross = jnp.dot(a * mask[None, :], b.T, preferred_element_type=a.dtype)
    return jnp.maximum(an[:, None] + bn[None, :] - 2.0 * cross, 0.0)


def _mask_diagonal(d2: jax.Array) -> jax.Array:
    """Exclude self-pairs: +big on d2[i, i]. Valid when query row i IS train
    row i (e.g. scoring the train set against itself, pyod's unsupplied-X
    ``kneighbors()`` semantics). Iota-based — no scatter."""
    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.asarray(jnp.finfo(d2.dtype).max / 4, d2.dtype)
    return jnp.where(rows == cols, big, d2)


# Beyond this train-set size the neighbor scorers stream the train axis in
# blocks (running exact k-smallest merge) instead of materializing the
# (nt, ntr) distance matrix — unbounded n_train at O(nt x block) memory.
STREAM_NTR = 16384
_STREAM_BLOCK = 8192
# Memory governors for the streaming route: the per-mask (nt, block)
# distance tile stays under _STREAM_TILE_BUDGET elements (the block
# shrinks for large query batches, e.g. predict() on a 100k-row train
# set), and the number of masks vmapped in flight is clamped so
# chunk x nt x block stays under _STREAM_CHUNK_BUDGET elements —
# without this a chunk=128 default would put gigabytes in flight.
_STREAM_TILE_BUDGET = 2**26
_STREAM_CHUNK_BUDGET = 2**27


# Query-count stand-in used when nt is a SYMBOLIC dimension (jax.export
# tracing): the streamed tiles are sized as if nt were this bound, so
# exported programs stay memory-safe for serving batches up to it.
_EXPORT_NT_HINT = 4096


def _stream_block(nt: int) -> int:
    """Train-block length for the streaming scorers at ``nt`` query rows."""
    if not isinstance(nt, int):  # symbolic batch dim under jax.export
        nt = _EXPORT_NT_HINT
    cap = max(512, (_STREAM_TILE_BUDGET // max(nt, 1)) // 128 * 128)
    return min(_STREAM_BLOCK, cap)


def _stream_chunk(chunk: int, nt: int, blk: int) -> int:
    """Clamp the vmapped-mask chunk so the streaming tiles fit memory."""
    return max(1, min(chunk, _STREAM_CHUNK_BUDGET // max(nt * blk, 1)))


# Mahalanobis materializes a (d, d) masked covariance + Cholesky per
# in-flight mask; bound chunk x d^2 elements (2^26 = 256 MB of f32).
_MAHA_CHUNK_BUDGET = 2**26

# ABOD gathers a (nt, k, d) neighbor-difference block per in-flight mask;
# bound chunk x nt x k x d elements (2^26 = 256 MB of f32).
_ABOD_CHUNK_BUDGET = 2**26

# test_chunk zscore: cache the moments pass's raw (n_subspaces, nt) scores
# on host (avoiding a second scoring pass) up to this many elements (2^28
# = 1 GB of f32); past it, native bases recompute instead.
_TEST_CHUNK_CACHE_ELEMS = 2**28


def _effective_chunk(
    base, chunk: int, nt: int, ntr: int, d: int, k: int = 0,
    n_clusters: int = 8, gmm_covariance: str = "diag",
    n_trees: int = 100, inne_psi: int = 8,
    kpca_sampling: bool = False, subset_size: int = 20,
    mcd_starts: int = 8, ae_hidden: tuple = (64, 32),
    sod_ref_set: int = 10,
) -> int:
    """Per-base memory governor for the vmapped-mask chunk — the single
    clamp shared by the live scoring paths and the serving exporters (the
    exporters pass their ``max_batch`` bound as ``nt``; the symbolic batch
    has no concrete value at trace time)."""
    if base in (
        "knn", "knn_mean", "lof", "abod", "cof", "kde"
    ) and ntr > STREAM_NTR:
        # streaming engages: bound the per-chunk (chunk, nt, block) tiles
        # (lof and cof also stream a train x train neighbor pass). The
        # knn-merge bases stream _MERGE_BLOCK-capped blocks (see
        # _masked_knn_streaming), so their tile is narrower than kde's.
        nt_eff = max(nt, ntr) if base in ("lof", "cof") else nt
        blk = _stream_block(nt_eff)
        if base != "kde":
            blk = min(blk, _MERGE_BLOCK)
        chunk = _stream_chunk(chunk, nt_eff, blk)
    if base in ("abod", "cof"):
        # the gathered (nt, k, d) neighbor-difference block per in-flight
        # mask is the dominant term; bound chunk x nt x k x d elements
        # (cof also gathers an (ntr, k, d) block for the train chains)
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        nt_eff = max(nt, ntr) if base == "cof" else nt
        per_mask = max(nt_eff * max(k, 2) * d, 1)
        return max(1, min(chunk, _ABOD_CHUNK_BUDGET // per_mask))
    if base == "mahalanobis":
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // max(d * d, 1)))
    if base == "inne":
        # per in-flight mask: the masked (T*psi, d) center copy + the
        # (nt, T, psi) query-coverage planes
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        tp = max(n_trees * inne_psi, 1)
        per_mask = max(tp * d + nt * tp, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "pca":
        # per in-flight mask: the standardized (ntr, d) train copy + its
        # (ntr, d) projections, the (d, d) covariance/eigenvectors, and
        # the (nt, d) query projections
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(2 * ntr * d + 2 * d * d + nt * d, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "kpca":
        # per in-flight mask: the (n, n) fit kernel + its centered copy
        # + eigh workspace (~2 n^2) + the (nt, n) test kernel/centered/
        # projection planes; n is the fit-subsample size when sampling
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        n = min(ntr, max(2, subset_size)) if kpca_sampling else ntr
        per_mask = max(4 * n * n + 3 * nt * n, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "mcd":
        # per in-flight mask: the masked (ntr, d) train copy + per start
        # (vmapped) the (d, ntr) triangular-solve plane, the (d, d)
        # covariance/Cholesky pair, and the (ntr,) distance/weight rows
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(
            ntr * d + mcd_starts * (2 * ntr * d + 2 * d * d) + nt * d, 1
        )
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "sod":
        # per in-flight mask: the (ntr, ntr) train distance + indicator
        # planes, the (nt, ntr) query distance/indicator/SNN planes, and
        # the gathered (nt, ref_set, d) reference block
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(
            2 * ntr * ntr + 3 * nt * ntr + nt * sod_ref_set * d, 1
        )
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base in ("ae", "dsvdd"):
        # per in-flight mask: weights + 3x Adam state, the layer
        # activations (forward + grads, ~4 passes) over the train rows,
        # and the test-row forward planes
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        h_sum = sum(ae_hidden)
        w = 2 * (d * ae_hidden[0] + sum(
            a * b for a, b in zip(ae_hidden[:-1], ae_hidden[1:])
        ))
        per_mask = max(
            6 * w + 4 * ntr * (d + h_sum) + nt * (d + h_sum), 1
        )
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "ocsvm":
        # per in-flight mask: the (ntr, ntr) train kernel (resident across
        # the FISTA scan) + a gradient/iterate workspace + the (nt, ntr)
        # test kernel + the masked (ntr, d) train copy
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(2 * ntr * ntr + nt * ntr + ntr * d, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "sos":
        # per in-flight mask: the (ntr, ntr) distance/shift planes + the
        # bisection's kernel plane (~4 ntr^2 in flight) + the (ntr, nt)
        # test affinity/binding planes
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(4 * ntr * ntr + 3 * ntr * nt, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base == "lmdd":
        # per in-flight mask: the masked (ntr, d) train copy + the (nt, d)
        # per-row moment planes; the aad measure additionally scans a
        # (_LMDD_BLOCK, nt, d) deviation plane
        if not isinstance(nt, int):  # symbolic batch dim under jax.export
            nt = _EXPORT_NT_HINT
        per_mask = max(ntr * d + 3 * nt * d + _LMDD_BLOCK * nt * d, 1)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    if base in ("cblof", "gmm"):
        # per in-flight mask: the masked (ntr, d) train copy + the (ntr,
        # n_clusters) assignment/responsibility planes (both k-means and
        # EM are linear in n — no streaming needed, just bound the vmap
        # width). Full-covariance gmm additionally materializes the
        # per-component (C, ntr, d) residuals and (C, d, d) covariances.
        c = max(n_clusters, 1)
        per_mask = max(ntr * (d + c), 1)
        if base == "gmm" and gmm_covariance == "full":
            per_mask = max(per_mask, c * ntr * d + c * d * d)
        return max(1, min(chunk, _MAHA_CHUNK_BUDGET // per_mask))
    return chunk


def _scan_masked_d2_blocks(x_test, x_train, mask, body, init, blk=None):
    """``lax.scan`` over ``blk``-length train blocks (default
    ``_stream_block(nt)``): the ONE place the streamed masked-distance
    machinery lives (padding/reshape, the matmul-identity d2, and the
    global column indices for padding and positional self-pair handling).
    ``body(carry, d2, cols) -> carry`` applies its own sentinel to padded
    columns (``cols >= n_train``) and, if needed, positional self-pairs
    (``rows == cols``) — the knn merge uses a big finite value, the kde
    logsumexp uses -inf."""
    nt = x_test.shape[0]
    n_tr, d = x_train.shape
    if blk is None:
        blk = _stream_block(nt)
    nb = -(-n_tr // blk)
    pad = nb * blk - n_tr
    blocks = jnp.pad(x_train, ((0, pad), (0, 0))).reshape(nb, blk, d)
    mask_f = mask.astype(x_test.dtype)
    an = jnp.dot(x_test * x_test, mask_f)  # (nt,)
    xm = x_test * mask_f[None, :]

    def wrapped(carry, inp):
        xb, b_idx = inp
        bn = jnp.dot(xb * xb, mask_f)
        cross = jnp.dot(xm, xb.T, preferred_element_type=x_test.dtype)
        d2 = jnp.maximum(an[:, None] + bn[None, :] - 2.0 * cross, 0.0)
        cols = b_idx * blk + jax.lax.broadcasted_iota(
            jnp.int32, d2.shape, 1
        )
        return body(carry, d2, cols), None

    carry, _ = jax.lax.scan(
        wrapped, init, (blocks, jnp.arange(nb, dtype=jnp.int32))
    )
    return carry


# Merge-bound streaming: sort-based top-k (approx_min_k, exact mode) costs
# grow superlinearly in the candidate-row width, so the knn merge streams
# narrower train blocks than the elementwise consumers (kde) do, and small
# k uses k lexicographic min/mask passes instead of a sort (the same
# extraction the fused Pallas kernel does in VMEM) — measured 5.6x on chip
# at nt=4096, ntr=20000, k=10 (1.45 s -> 0.26 s per 25-mask chunk).
_MERGE_BLOCK = 2048
_KPASS_MAX_K = 128      # above: approx_min_k per block, with a loud warning
_KPASS_UNROLL_MAX = 16  # larger k runs the SAME passes under lax.scan


def _masked_knn_streaming(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool,
):
    """Exact (vals, idx) of the k smallest masked squared distances with
    the train axis streamed in blocks.

    A ``lax.scan`` carries the running (nt, k) smallest values/indices —
    the (nt, ntr) matrix never exists, so n_train is unbounded at
    O(nt x block) memory per mask in flight. Each block merges into the
    carry via k lexicographic (value, index) min/mask passes (exact incl.
    ties, deterministic smallest-index order — VPU reductions, no sort):
    unrolled for k <= ``_KPASS_UNROLL_MAX``, the same passes under a
    ``lax.scan`` up to ``_KPASS_MAX_K`` (linear cost in k, O(1) program
    size), and ``approx_min_k`` in exact mode above that — a several-times
    slower regime that warns loudly (docs/SCALING.md). Returns ascending
    ``(d2_vals (nt, k), train_idx (nt, k))``.
    """
    nt = x_test.shape[0]
    ntr = x_train.shape[0]
    big = jnp.asarray(jnp.finfo(x_test.dtype).max / 4, x_test.dtype)
    int_big = jnp.int32(2**31 - 1)

    def candidates(carry, d2, cols):
        vals, idxs = carry  # (nt, k) each
        d2 = jnp.where(cols < ntr, d2, big)  # block padding is no neighbor
        if exclude_self:
            rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
            d2 = jnp.where(rows == cols, big, d2)
        cand_vals = jnp.concatenate([vals, d2], axis=1)
        cand_idx = jnp.concatenate(
            [idxs, jnp.broadcast_to(cols, d2.shape)], axis=1
        )
        return cand_vals, cand_idx

    def _one_pass(cand_vals, cand_idx, lv, li):
        """Extract the lexicographically-next (value, index) pair after
        (lv, li) from each candidate row — one VPU min-reduction pair."""
        elig = (cand_vals > lv) | ((cand_vals == lv) & (cand_idx > li))
        mvals = jnp.where(elig, cand_vals, big)
        cur = jnp.min(mvals, axis=1, keepdims=True)
        curi = jnp.min(
            jnp.where(mvals == cur, cand_idx, int_big),
            axis=1, keepdims=True,
        )
        return cur, curi

    def body_kpass(carry, d2, cols):
        cand_vals, cand_idx = candidates(carry, d2, cols)
        lv = jnp.full((nt, 1), -jnp.inf, x_test.dtype)
        li = jnp.full((nt, 1), jnp.int32(-(2**31)) + 1, jnp.int32)
        if k <= _KPASS_UNROLL_MAX:
            out_v, out_i = [], []
            for _ in range(k):
                lv, li = _one_pass(cand_vals, cand_idx, lv, li)
                out_v.append(lv)
                out_i.append(li)
            return (jnp.concatenate(out_v, axis=1),
                    jnp.concatenate(out_i, axis=1))

        # identical passes under lax.scan: cost stays linear in k while
        # the PROGRAM stays O(1) in k — the round-3 k<=32 unroll cap was
        # a compile-size guard, not an algorithmic one (round-4 item 7)
        def pass_step(state, _):
            lv, li = state
            lv, li = _one_pass(cand_vals, cand_idx, lv, li)
            return (lv, li), (lv[:, 0], li[:, 0])

        _, (vs, is_) = jax.lax.scan(pass_step, (lv, li), None, length=k)
        return vs.T, is_.T

    def body_sort(carry, d2, cols):
        cand_vals, cand_idx = candidates(carry, d2, cols)
        new_vals, pos = jax.lax.approx_min_k(cand_vals, k, recall_target=1.0)
        new_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        return (new_vals, new_idx)

    if k > _KPASS_MAX_K:
        # approx_min_k in exact mode costs ~19 ms per (4096, 2048+k) merge
        # block on v5e — superlinear vs the k-pass path. Loud, once.
        import warnings

        warnings.warn(
            f"streaming kNN merge with k={k} > {_KPASS_MAX_K} falls back "
            "to a per-block sort (approx_min_k), which is several times "
            "slower than the k-pass merge — large-k neighbor bases on "
            "streamed train sets (n_train > STREAM_NTR) are a slow "
            "regime; see docs/SCALING.md",
            RuntimeWarning,
            stacklevel=2,
        )
    init = (
        jnp.full((nt, k), big, x_test.dtype),
        jnp.full((nt, k), -1, jnp.int32),
    )
    return _scan_masked_d2_blocks(
        x_test, x_train, mask,
        body_kpass if k <= _KPASS_MAX_K else body_sort, init,
        blk=min(_stream_block(nt), _MERGE_BLOCK),
    )


def knn_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool = False,
) -> jax.Array:
    """k-th nearest-neighbor distance in the masked space (pyod KNN
    'largest' semantics). ``exclude_self`` drops the (i, i) pair — use when
    the leading query rows are the training rows themselves. Train sets
    past ``STREAM_NTR`` stream in blocks (unbounded n_train)."""
    if x_train.shape[0] > STREAM_NTR:
        vals, _ = _masked_knn_streaming(
            x_test, x_train, mask, k, exclude_self
        )
        return jnp.sqrt(vals[:, -1])
    d2 = _masked_sq_dists(x_test, x_train, mask)
    if exclude_self:
        d2 = _mask_diagonal(d2)
    # approx_min_k(recall_target=1.0) is exact and ~2.3x faster than
    # top_k on TPU (the sort dominates the whole ensemble otherwise)
    vals, _ = jax.lax.approx_min_k(d2, k, recall_target=1.0)
    return jnp.sqrt(vals[:, -1])


def mean_dist_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool = False,
) -> jax.Array:
    """Mean distance to the k nearest neighbors (pyod KNN 'mean')."""
    if x_train.shape[0] > STREAM_NTR:
        vals, _ = _masked_knn_streaming(
            x_test, x_train, mask, k, exclude_self
        )
        return jnp.mean(jnp.sqrt(vals), axis=-1)
    d2 = _masked_sq_dists(x_test, x_train, mask)
    if exclude_self:
        d2 = _mask_diagonal(d2)
    vals, _ = jax.lax.approx_min_k(d2, k, recall_target=1.0)
    return jnp.mean(jnp.sqrt(vals), axis=-1)


def lof_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool = False,
) -> jax.Array:
    """Local outlier factor in the masked space (novelty-style: test points
    scored against the train set, matching sklearn/pyod LOF(novelty=True)).
    """
    eps = 1e-12
    n_tr = x_train.shape[0]
    if n_tr > STREAM_NTR:
        # streamed exact k-NN (unbounded n_train): selection on d2 is
        # order-equivalent to selection on d; sqrt after
        d2_tr_vals, nbr_tr = _masked_knn_streaming(
            x_train, x_train, mask, k, exclude_self=True
        )
        knn_d_tr = jnp.sqrt(d2_tr_vals)
        d2_te_vals, nbr_te = _masked_knn_streaming(
            x_test, x_train, mask, k, exclude_self=exclude_self
        )
        knn_d_te = jnp.sqrt(d2_te_vals)
    else:
        d2_tr = _masked_sq_dists(x_train, x_train, mask)
        big = jnp.asarray(jnp.finfo(d2_tr.dtype).max / 4)
        # exclude self-pairs via an iota mask (TPU-friendly; no scatter)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_tr, n_tr), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_tr, n_tr), 1)
        d_tr = jnp.where(rows == cols, big, jnp.sqrt(d2_tr))
        knn_d_tr, nbr_tr = jax.lax.approx_min_k(d_tr, k, recall_target=1.0)

        d2_te = _masked_sq_dists(x_test, x_train, mask)
        if exclude_self:
            d2_te = _mask_diagonal(d2_te)
        d_te = jnp.sqrt(d2_te)
        knn_d_te, nbr_te = jax.lax.approx_min_k(d_te, k, recall_target=1.0)

    kdist_tr = knn_d_tr[:, -1]  # (ntr, k) ascending distances
    # lrd of train points
    reach_tr = jnp.maximum(kdist_tr[nbr_tr], knn_d_tr)
    lrd_tr = 1.0 / (jnp.mean(reach_tr, axis=-1) + eps)
    # test points vs train set
    reach_te = jnp.maximum(kdist_tr[nbr_te], knn_d_te)
    lrd_te = 1.0 / (jnp.mean(reach_te, axis=-1) + eps)
    return jnp.mean(lrd_tr[nbr_te], axis=-1) / (lrd_te + eps)


def _neighbor_diff_gram(
    x: jax.Array, x_train: jax.Array, mask_f: jax.Array, idx: jax.Array
):
    """(dots, sq) of the masked neighbor differences: for each query row x_i
    with gathered neighbors a_1..a_k, ``dots[i]`` is the (k, k) Gram of
    (a_j - x_i) restricted to the masked dims — ONE batched (k x d) @ (d x k)
    matmul per query row — and ``sq[i]`` its diagonal, the squared neighbor
    distances recomputed STABLY (the matmul-identity d2 used for neighbor
    selection suffers cancellation for close pairs). Shared by the abod and
    cof bases."""
    diffs = x_train[idx] * mask_f[None, None, :] - (
        x * mask_f[None, :]
    )[:, None, :]
    dots = jnp.einsum(
        "nkd,nld->nkl", diffs, diffs,
        preferred_element_type=x_train.dtype,
    )
    return dots, jnp.diagonal(dots, axis1=1, axis2=2)


def _masked_knn_vals_idx(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool,
):
    """(d2 (nt, k), train_idx (nt, k)) ascending — dense below STREAM_NTR,
    streamed past it. The one neighbor-search entry the gather-based bases
    (abod, cof) share."""
    if x_train.shape[0] > STREAM_NTR:
        return _masked_knn_streaming(x_test, x_train, mask, k, exclude_self)
    d2_all = _masked_sq_dists(x_test, x_train, mask)
    if exclude_self:
        d2_all = _mask_diagonal(d2_all)
    return jax.lax.approx_min_k(d2_all, k, recall_target=1.0)


def _cof_ac_dist(
    x: jax.Array, x_train: jax.Array, mask_f: jax.Array, idx: jax.Array,
    k: int,
) -> jax.Array:
    """Average chaining distance of each query row through its k nearest
    masked train neighbors (ascending ``idx`` order, the query itself as the
    chain root): the cost of adding neighbor j is its minimum masked distance
    to the prefix {root, n_1..n_{j-1}}, weighted 2(k+1-j)/((k+1)k) — pyod
    cof's set-based-nearest-path approximation (chain ORDER fixed by distance
    from the root, per-step cost against the whole prefix)."""
    dots, sq = _neighbor_diff_gram(x, x_train, mask_f, idx)
    root_d = jnp.sqrt(jnp.maximum(sq, 0.0))  # (n, k) distance to the root
    # pairwise neighbor distances from the difference Gram:
    # |a_i - a_j|^2 = |a_i - x|^2 + |a_j - x|^2 - 2 <a_i - x, a_j - x>
    # f32 precision bound: this identity cancels for neighbor pairs much
    # closer to each other than to the root (|a_i-a_j|^2 ~ eps * sq), i.e.
    # relative error up to ~sq/|a_i-a_j|^2 ULPs — and COF's prefix-min
    # selects exactly those smallest pair distances. Absolute error stays
    # ~sqrt(eps_f32)*root_d, which the rtol=1e-3 parity tests absorb; if
    # tolerance ever tightens, switch to explicit diffs
    # (diffs[:,:,None]-diffs[:,None,:]) at k x the memory.
    pair_d = jnp.sqrt(
        jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    big = jnp.asarray(jnp.finfo(x.dtype).max / 4, x.dtype)
    # min over the strictly-earlier neighbors (j=0 has none -> big)
    prefix_min = jnp.min(
        jnp.where((cols < rows)[None, :, :], pair_d, big), axis=2
    )
    cost = jnp.minimum(root_d, prefix_min)
    j = jnp.arange(1, k + 1, dtype=x.dtype)
    weights = 2.0 * (k + 1 - j) / ((k + 1) * k)
    return jnp.sum(cost * weights[None, :], axis=-1)


def cof_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool = False,
) -> jax.Array:
    """Connectivity-based outlier factor in the masked subspace (Tang et
    al. 2002; pyod.models.cof — the chaining-distance neighbor family of the
    reference's pyod surface, /root/reference/requirements.txt:58).

        COF(x) = k * ac_dist(x) / sum_{o in kNN(x)} ac_dist(o)

    where ``ac_dist`` is the average chaining distance (:func:`_cof_ac_dist`)
    — an isolated point chains expensively relative to its neighbors'
    chains, so COF > 1 flags outliers (pyod's decision_scores_ orientation
    already; no sign flip). Train rows' ac_dist always excludes the self
    pair (pyod's sbn_path[1:]); ``exclude_self`` applies the same positional
    drop to the query rows (scoring the train set itself — then this equals
    pyod COF's fit-time decision_scores_ on the projected dims).

    TPU-native shape: both neighbor searches ride the shared masked-distance
    MXU matmuls (streamed past ``STREAM_NTR``); each chain's pairwise
    prefix-min needs only the (k, k) difference Gram per query row
    (:func:`_neighbor_diff_gram`) — no sequential path construction, because
    pyod's chain order is simply ascending distance from the root.
    Divergence vs pyod (documented): an all-duplicate neighborhood
    (ac_dist 0/0) returns 0 via an eps-guarded denominator instead of
    nan_to_num; neighbor TIES break by smallest index (np.argsort's
    quicksort order is unspecified there).
    """
    if k < 1:
        raise ValueError(f"cof needs k >= 1 (the chaining set); got k={k}")
    if k >= x_train.shape[0]:
        # The internal train-chain pass always drops the self pair, so only
        # n_train-1 true neighbors exist; beyond that the diagonal-masked
        # self row (distance 0) would silently enter the chain and deflate
        # ac_tr. pyod clamps n_neighbors to n_samples-1; we raise loudly.
        raise ValueError(
            f"cof needs k < n_train (self excluded from the train chain); "
            f"got k={k}, n_train={x_train.shape[0]}"
        )
    eps = 1e-12
    mask_f = mask.astype(x_train.dtype)
    d2_tr, idx_tr = _masked_knn_vals_idx(
        x_train, x_train, mask, k, exclude_self=True
    )
    del d2_tr
    ac_tr = _cof_ac_dist(x_train, x_train, mask_f, idx_tr, k)
    d2_te, idx_te = _masked_knn_vals_idx(
        x_test, x_train, mask, k, exclude_self=exclude_self
    )
    del d2_te
    ac_te = _cof_ac_dist(x_test, x_train, mask_f, idx_te, k)
    denom = jnp.sum(ac_tr[idx_te], axis=-1)
    return ac_te * k / (denom + eps)


def abod_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int,
    exclude_self: bool = False,
) -> jax.Array:
    """Negated angle-based outlier factor in the masked subspace (FastABOD,
    Kriegel et al. 2008; pyod.models.abod with method='fast' — the
    angle-based family of the reference's pyod surface, requirements.txt:58).

    For each test row x, the k nearest masked neighbors a_1..a_k define
    k(k-1)/2 unordered difference pairs, and

        ABOF(x) = Var_{i<j} [ <a_i - x, a_j - x>_m
                              / (|a_i - x|_m^2 * |a_j - x|_m^2) ]

    (population variance over pairs, as pyod's np.var; inner products
    restricted to the masked dims). Inliers see neighbors all around them
    (high angular variance), outliers see the cluster under a narrow cone
    (low variance) — so the score is ``-ABOF`` (pyod's decision_scores_
    sign flip: higher = more outlying).

    TPU-native shape: the neighbor search rides the same masked-distance
    MXU matmuls as the knn bases (streamed past ``STREAM_NTR``); the
    gathered (nt, k, d) neighbor differences then yield ALL pairwise inner
    products as ONE batched (k x d) @ (d x k) matmul per test row, whose
    diagonal already IS the squared neighbor distances. ``exclude_self``
    drops the positional (i, i) train pair as for the other neighbor
    bases. Divergence vs pyod (documented): coincident points (zero
    neighbor distance) get an eps-guarded denominator instead of a NaN.
    """
    if k < 2:
        raise ValueError(
            f"abod needs k >= 2 (the angle variance is over neighbor "
            f"PAIRS); got k={k}"
        )
    eps = 1e-12
    mask_f = mask.astype(x_train.dtype)
    _, idx = _masked_knn_vals_idx(x_test, x_train, mask, k, exclude_self)
    # squared neighbor distances from the STABLE Gram diagonal (the
    # matmul-identity d2 used for selection suffers cancellation for close
    # neighbors — exactly the pairs whose 1/d2^2 weight dominates ABOF)
    dots, sq = _neighbor_diff_gram(x_test, x_train, mask_f, idx)
    wcos = dots / (sq[:, :, None] * sq[:, None, :] + eps)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    pair = (rows < cols).astype(x_train.dtype)[None, :, :]
    n_pairs = k * (k - 1) // 2
    mean = jnp.sum(wcos * pair, axis=(1, 2)) / n_pairs
    var = jnp.sum(
        (wcos - mean[:, None, None]) ** 2 * pair, axis=(1, 2)
    ) / n_pairs
    return -var


def mahalanobis_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
) -> jax.Array:
    """Squared Mahalanobis distance to the train distribution in the masked
    subspace — the PCA-family base detector (equals the sum over ALL
    principal components of proj^2/eigenvalue, i.e. the classic PCA outlier
    score of Shyu et al. with every component kept; pyod's MCD without the
    robust covariance estimator). Reference capability: the pyod pin at
    /root/reference/requirements.txt:58 (PCA/MCD detector family).

    TPU-native trick: centering commutes with masking, so the masked
    covariance is the Hadamard-masked FULL covariance
    ``cov_m = (m m^T) .* cov`` — one (n x d^2) matmul shared by every mask
    (mask-independent, so XLA computes it once per vmapped chunk), then one
    (d, d) Cholesky + triangular solve per mask. Unmasked dims get an
    identity diagonal (and contribute exactly 0 to the quadratic form since
    the residual is masked); masked dims get a scale-aware 1e-6 ridge so
    rank-deficient subspaces (d_sub > n_train - 1) stay solvable.

    ``k`` is ignored (signature parity with the neighbor scorers). Self-
    inclusion is inherent (distribution-based, like iforest/copod).
    """
    del k
    mask_f = mask.astype(x_train.dtype)
    n = x_train.shape[0]
    mu = jnp.mean(x_train, axis=0)
    xc = x_train - mu[None, :]
    cov = jnp.dot(
        xc.T, xc, preferred_element_type=x_train.dtype
    ) / max(n - 1, 1)
    cov_m = cov * (mask_f[:, None] * mask_f[None, :])
    d_sub = jnp.maximum(jnp.sum(mask_f), 1.0)
    # absolute floor keeps the factorization PD even when every masked
    # column is constant (trace == 0): a deviating test point then gets a
    # huge-but-finite score instead of silent Cholesky NaNs
    ridge = jnp.maximum(1e-6 * jnp.trace(cov_m) / d_sub, 1e-12)
    cov_m = cov_m + jnp.diag(mask_f * ridge + (1.0 - mask_f))
    z = (x_test - mu[None, :]) * mask_f[None, :]
    chol = jnp.linalg.cholesky(cov_m)
    w = jax.scipy.linalg.cho_solve((chol, True), z.T)  # (d, nt)
    return jnp.sum(z * w.T, axis=-1)


def _cblof_large_mask(
    counts: jax.Array, n_tr: int, alpha: float, beta: float,
) -> jax.Array:
    """pyod's CBLOF large/small cluster split as a (C,) boolean mask.

    Over size-sorted clusters, boundary candidates are i = 1..C-1: the
    alpha rule fires where the top-i sizes cover ``alpha * n``, the beta
    rule where ``size[i-1] / size[i] >= beta`` (eps floor so 0/0
    boundaries never fire). The threshold is the first boundary
    satisfying BOTH rules, else the first alpha boundary, else the first
    beta boundary; when nothing fires — where pyod raises mid-fit — every
    cluster is large (a raise inside jit/vmap is impossible). EMPTY
    clusters are never large regardless: a cluster that ended k-means
    with zero members kept its stale init centroid, and letting it claim
    test points (possible in the all-large fallback, whose threshold
    spans the whole size-sorted tail) would under-score an outlier near a
    position that represents no train data."""
    n_clusters = counts.shape[0]
    order = jnp.argsort(-counts)
    sorted_sizes = counts[order]
    alpha_ok = jnp.cumsum(sorted_sizes)[:-1] >= alpha * n_tr
    beta_ok = sorted_sizes[:-1] >= beta * jnp.maximum(sorted_sizes[1:], 1e-9)

    def first_boundary(ok):
        return jnp.where(jnp.any(ok), jnp.argmax(ok) + 1, n_clusters)

    both = alpha_ok & beta_ok
    thr = jnp.where(
        jnp.any(both), first_boundary(both),
        jnp.where(
            jnp.any(alpha_ok), first_boundary(alpha_ok),
            first_boundary(beta_ok),
        ),
    )
    large_sorted = (jnp.arange(n_clusters) < thr) & (sorted_sizes > 0)
    return jnp.zeros(n_clusters, bool).at[order].set(large_sorted)


def cblof_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_clusters: int = 8, alpha: float = 0.9, beta: float = 5.0,
    kmeans_iter: int = 30, cluster_seed: int = 0, init: str = "rows",
) -> jax.Array:
    """Cluster-Based Local Outlier Factor in the masked subspace (He, Xu &
    Deng 2003; pyod.models.cblof with use_weights=False — the clustering
    base family of the reference's pyod surface, requirements.txt:58).

    k-means (Lloyd, ``kmeans_iter`` fixed iterations, seeded train-row
    init) clusters the masked train rows; clusters are split into large /
    small by pyod's rule over size-sorted clusters (first boundary i where
    the top-i sizes cover ``alpha * n`` AND the size ratio across the
    boundary is >= ``beta``; else first alpha boundary; else first beta
    boundary). A point in a large cluster scores its distance to its own
    centroid; a point in a small cluster scores its distance to the
    NEAREST LARGE centroid (masked Euclidean).

    TPU-native shape: one ``lax.scan`` over Lloyd iterations, each a pair
    of MXU matmuls (assignment via the d2 matmul identity, centroid update
    via one-hot^T @ X) — no data-dependent loops, so ``vmap`` batches the
    whole clustering over mask chunks; the seeded init rows are shared
    across masks (hoisted) and masked per subspace. Divergences vs pyod
    (documented): k-means is our fixed-iteration Lloyd with seeded row
    init rather than sklearn's k-means++/n_init=10 (cluster assignments
    can differ; the large/small rule and scoring on top are exact —
    ``init='kmeans++'`` narrows this to single-restart D^2 seeding), and
    when NEITHER rule fires pyod raises mid-fit while this scorer
    degrades to all-clusters-large (own-centroid distance everywhere) —
    a raise inside jit/vmap is impossible.

    ``k`` is ignored (signature parity). Self-inclusion is inherent
    (distribution-based, like iforest/mahalanobis).
    """
    del k
    n_tr = x_train.shape[0]
    if n_clusters < 2:
        raise ValueError(
            f"cblof needs n_clusters >= 2 (the large/small split is over "
            f"at least two clusters); got {n_clusters}"
        )
    if n_clusters > n_tr:
        raise ValueError(
            f"cblof needs n_clusters <= n_train; got {n_clusters} clusters "
            f"for {n_tr} train rows"
        )
    if not 0.0 < alpha <= 1.0:
        raise ValueError(
            f"cblof needs alpha in (0, 1] (fraction of train rows the "
            f"large clusters must cover); got {alpha!r}"
        )
    if not beta >= 1.0:
        raise ValueError(
            f"cblof needs beta >= 1 (size ratio across the large/small "
            f"boundary); got {beta!r}"
        )
    mask_f = mask.astype(x_train.dtype)
    xm_tr = x_train * mask_f[None, :]
    xm_te = x_test * mask_f[None, :]
    cen0 = _init_centroids(xm_tr, n_clusters, cluster_seed, init)
    tr_sq = jnp.sum(xm_tr * xm_tr, axis=1)

    def centroid_d2(x_sq, xmat, cen):
        c_sq = jnp.sum(cen * cen, axis=1)
        cross = jnp.dot(xmat, cen.T, preferred_element_type=xmat.dtype)
        return jnp.maximum(x_sq[:, None] + c_sq[None, :] - 2.0 * cross, 0.0)

    def lloyd(cen, _):
        lab = jnp.argmin(centroid_d2(tr_sq, xm_tr, cen), axis=1)
        one = jax.nn.one_hot(lab, n_clusters, dtype=xm_tr.dtype)
        counts = jnp.sum(one, axis=0)
        sums = jnp.dot(one.T, xm_tr, preferred_element_type=xm_tr.dtype)
        # empty clusters keep their previous centroid (no reseeding — the
        # deterministic analogue of sklearn's relocation would be
        # data-dependent control flow)
        new = jnp.where(
            counts[:, None] > 0,
            sums / jnp.maximum(counts[:, None], 1.0), cen,
        )
        return new, None

    cen, _ = jax.lax.scan(lloyd, cen0, None, length=kmeans_iter)
    lab_tr = jnp.argmin(centroid_d2(tr_sq, xm_tr, cen), axis=1)
    counts = jnp.sum(
        jax.nn.one_hot(lab_tr, n_clusters, dtype=xm_tr.dtype), axis=0
    )

    large = _cblof_large_mask(counts, n_tr, alpha, beta)

    d2_te = centroid_d2(jnp.sum(xm_te * xm_te, axis=1), xm_te, cen)
    lab_te = jnp.argmin(d2_te, axis=1)
    own = jnp.sqrt(jnp.take_along_axis(d2_te, lab_te[:, None], axis=1)[:, 0])
    big = jnp.asarray(jnp.finfo(x_test.dtype).max / 4, x_test.dtype)
    nearest_large = jnp.sqrt(jnp.min(
        jnp.where(large[None, :], d2_te, big), axis=1
    ))
    return jnp.where(large[lab_te], own, nearest_large)


def _init_centroids(
    xm: jax.Array, n_clusters: int, seed: int, method: str,
) -> jax.Array:
    """Seeded (C, d) centroid init shared by cblof and gmm.

    'rows' picks ``n_clusters`` distinct train rows (the key is shared
    across masks so ``vmap`` hoists the row choice; rows are masked per
    subspace). 'kmeans++' runs the classic D^2-weighted sequential
    seeding (Arthur & Vassilvitskii 2007 — sklearn/pyod's default
    k-means init) as a C-step ``lax.scan``: each step computes distances
    to the last-added centroid with one matvec, folds the running min-d2,
    and draws the next centroid via ``jax.random.categorical`` on
    ``log d2`` — deterministic per seed, no data-dependent control flow,
    and under ``vmap`` each mask draws its OWN seeding because the masked
    distances differ."""
    n = xm.shape[0]
    key = jax.random.PRNGKey(seed)
    if method == "rows":
        rows = jax.random.choice(key, n, (n_clusters,), replace=False)
        return xm[rows]
    if method != "kmeans++":
        raise ValueError(
            f"unknown cluster_init={method!r}: expected 'rows' or "
            "'kmeans++'"
        )
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    cen0 = jnp.zeros((n_clusters, xm.shape[1]), xm.dtype).at[0].set(
        xm[first]
    )
    x_sq = jnp.sum(xm * xm, axis=1)

    def step(carry, i):
        cen, key, mind2 = carry
        c = cen[i - 1]
        d2 = jnp.maximum(
            x_sq - 2.0 * jnp.dot(xm, c) + jnp.sum(c * c), 0.0
        )
        mind2 = jnp.minimum(mind2, d2)
        key, kd = jax.random.split(key)
        nxt = jax.random.categorical(kd, jnp.log(mind2 + 1e-12))
        return (cen.at[i].set(xm[nxt]), key, mind2), None

    big = jnp.asarray(jnp.finfo(xm.dtype).max / 4, xm.dtype)
    (cen, _, _), _ = jax.lax.scan(
        step, (cen0, key, jnp.full((n,), big, xm.dtype)),
        jnp.arange(1, n_clusters),
    )
    return cen


def gmm_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_components: int = 4, em_iter: int = 30, component_seed: int = 0,
    reg_covar: float = 1e-6, init: str = "rows", covariance: str = "diag",
) -> jax.Array:
    """Negative Gaussian-mixture log-likelihood in the masked subspace —
    the probabilistic-mixture base family (pyod.models.gmm semantics:
    ``decision_scores_ = -score_samples``; reference capability via the
    pyod pin at requirements.txt:58).

    EM with ``em_iter`` fixed iterations and seeded train-row means init
    (rows shared across masks so ``vmap`` hoists them).
    ``covariance='diag'`` (default) keeps every E/M step matmul-shaped:
    the quadratic form expands to three ``(n, d) @ (d, C)`` contractions
    against per-component ``mask/var`` vectors, and the M-step moments
    are ``resp.T @ xm`` / ``resp.T @ xm^2``. ``covariance='full'`` is
    sklearn's default family: per-component (d, d) covariances via the
    mahalanobis-base trick — centering commutes with masking, so each
    masked covariance is the Hadamard-masked ``(m m^T) .* Sigma_c`` with
    an identity diagonal on unmasked dims, one Cholesky + triangular
    solve per component per iteration (M-step covariances are
    ``z^T @ (resp_c .* z)`` batched matmuls). Neither path has
    data-dependent control flow, so the whole EM batches over mask
    chunks under ``vmap``.

    Divergences vs pyod/sklearn (documented): fixed-iteration EM with
    seeded row init rather than k-means init + convergence checks
    (``init='kmeans++'`` gives D^2-weighted seeding instead), and
    ``reg_covar`` floors the diagonal variances (sklearn adds it). ``k``
    is ignored (signature parity); self-inclusion is inherent.
    """
    del k
    n_tr = x_train.shape[0]
    if n_components < 1:
        raise ValueError(
            f"gmm needs n_components >= 1; got {n_components}"
        )
    if n_components > n_tr:
        raise ValueError(
            f"gmm needs n_components <= n_train; got {n_components} "
            f"components for {n_tr} train rows"
        )
    if covariance not in ("diag", "full"):
        raise ValueError(
            f"unknown covariance={covariance!r}: expected 'diag' or 'full'"
        )
    mask_f = mask.astype(x_train.dtype)
    xm_tr = x_train * mask_f[None, :]
    xm_te = x_test * mask_f[None, :]
    d_sub = jnp.sum(mask_f)
    mu0 = _init_centroids(xm_tr, n_components, component_seed, init)
    log2pi_ = jnp.log(2.0 * jnp.pi).astype(x_train.dtype)
    if covariance == "full":
        return _gmm_full_nll(
            xm_te, xm_tr, mask_f, mu0, n_components, em_iter, reg_covar,
            d_sub, log2pi_,
        )
    var_tr = jnp.var(xm_tr, axis=0)
    var0 = jnp.broadcast_to(
        jnp.maximum(var_tr, reg_covar)[None, :], mu0.shape
    ) * mask_f[None, :] + (1.0 - mask_f)[None, :]
    logw0 = jnp.full(
        (n_components,), -jnp.log(float(n_components)), x_train.dtype
    )
    log2pi = jnp.log(2.0 * jnp.pi).astype(x_train.dtype)

    def log_prob(xmat, mu, var, logw):
        # (n, C) component log-densities over the masked dims only:
        # quad expands to matmuls against mask/var, mu.mask/var
        inv = mask_f[None, :] / var  # (C, d), zero on unmasked dims
        quad = (
            jnp.dot(xmat * xmat, inv.T,
                    preferred_element_type=xmat.dtype)
            - 2.0 * jnp.dot(xmat, (mu * inv).T,
                            preferred_element_type=xmat.dtype)
            + jnp.sum(mu * mu * inv, axis=1)[None, :]
        )
        logdet = jnp.sum(mask_f[None, :] * jnp.log(var), axis=1)
        return logw[None, :] - 0.5 * (
            quad + logdet[None, :] + d_sub * log2pi
        )

    def em(carry, _):
        mu, var, logw = carry
        resp = jax.nn.softmax(log_prob(xm_tr, mu, var, logw), axis=1)
        nc = jnp.sum(resp, axis=0) + 1e-12  # (C,)
        new_mu = jnp.dot(
            resp.T, xm_tr, preferred_element_type=xm_tr.dtype
        ) / nc[:, None]
        ex2 = jnp.dot(
            resp.T, xm_tr * xm_tr, preferred_element_type=xm_tr.dtype
        ) / nc[:, None]
        new_var = jnp.maximum(ex2 - new_mu * new_mu, 0.0) + reg_covar
        new_var = new_var * mask_f[None, :] + (1.0 - mask_f)[None, :]
        new_logw = jnp.log(nc / jnp.sum(nc))
        return (new_mu, new_var, new_logw), None

    (mu, var, logw), _ = jax.lax.scan(
        em, (mu0, var0, logw0), None, length=em_iter
    )
    return -jax.nn.logsumexp(log_prob(xm_te, mu, var, logw), axis=1)


def _gmm_full_nll(
    xm_te, xm_tr, mask_f, mu0, n_components, em_iter, reg_covar, d_sub,
    log2pi,
):
    """Full-covariance EM tail of :func:`gmm_scores_masked`: per-component
    (d, d) covariances, masked via the mahalanobis-base identity
    (``cov_m = (m m^T) .* Sigma`` + identity diagonal on unmasked dims,
    whose Cholesky diag is 1 so unmasked dims add 0 to the logdet and 0
    to the quadratic form since residuals are masked)."""
    n_tr, d = xm_tr.shape
    mm = mask_f[:, None] * mask_f[None, :]
    fix_diag = jnp.diag(mask_f * reg_covar + (1.0 - mask_f))

    def mask_cov(cov):  # (C, d, d)
        return cov * mm[None, :, :] + fix_diag[None, :, :]

    xc0 = xm_tr - jnp.mean(xm_tr, axis=0)[None, :]
    cov_tr = jnp.dot(
        xc0.T, xc0, preferred_element_type=xm_tr.dtype
    ) / max(n_tr - 1, 1)
    cov0 = mask_cov(jnp.broadcast_to(cov_tr[None, :, :],
                                     (n_components, d, d)))
    logw0 = jnp.full(
        (n_components,), -jnp.log(float(n_components)), xm_tr.dtype
    )

    def log_prob(xmat, mu, cov, logw):
        chol = jnp.linalg.cholesky(cov)  # (C, d, d)

        def comp(mu_c, chol_c):
            z = (xmat - mu_c[None, :]) * mask_f[None, :]
            w = jax.scipy.linalg.cho_solve((chol_c, True), z.T)
            quad = jnp.sum(z * w.T, axis=1)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_c)))
            return quad + logdet

        ql = jax.vmap(comp)(mu, chol)  # (C, n)
        return logw[None, :] - 0.5 * (ql.T + d_sub * log2pi)

    def em(carry, _):
        mu, cov, logw = carry
        resp = jax.nn.softmax(log_prob(xm_tr, mu, cov, logw), axis=1)
        nc = jnp.sum(resp, axis=0) + 1e-12
        new_mu = jnp.dot(
            resp.T, xm_tr, preferred_element_type=xm_tr.dtype
        ) / nc[:, None]

        def comp_cov(mu_c, r_c, nc_c):
            z = xm_tr - mu_c[None, :]
            return jnp.dot(
                z.T * r_c[None, :], z, preferred_element_type=xm_tr.dtype
            ) / nc_c

        new_cov = mask_cov(jax.vmap(comp_cov)(new_mu, resp.T, nc))
        new_logw = jnp.log(nc / jnp.sum(nc))
        return (new_mu, new_cov, new_logw), None

    (mu, cov, logw), _ = jax.lax.scan(
        em, (mu0, cov0, logw0), None, length=em_iter
    )
    return -jax.nn.logsumexp(log_prob(xm_te, mu, cov, logw), axis=1)


@functools.lru_cache(maxsize=None)
def _gmm_scorer(
    n_components: int, em_iter: int, seed: int, init: str, covariance: str,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        gmm_scores_masked,
        n_components=n_components, em_iter=em_iter, component_seed=seed,
        init=init, covariance=covariance,
    )


@functools.lru_cache(maxsize=None)
def _cblof_scorer(
    n_clusters: int, alpha: float, beta: float, kmeans_iter: int, seed: int,
    init: str,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        cblof_scores_masked,
        n_clusters=n_clusters, alpha=alpha, beta=beta,
        kmeans_iter=kmeans_iter, cluster_seed=seed, init=init,
    )


def _kde_log_kernel_sum(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array,
    bandwidth: float, exclude_self: bool,
) -> jax.Array:
    """``logsumexp_j(-d2_m(test_i, train_j) / (2 h^2))`` per test row, with
    the train axis streamed in blocks past ``STREAM_NTR`` (running
    max + rescaled sumexp carry — the (nt, ntr) matrix never
    materializes)."""
    inv = 1.0 / (2.0 * bandwidth * bandwidth)
    n_tr = x_train.shape[0]
    if n_tr <= STREAM_NTR:
        d2 = _masked_sq_dists(x_test, x_train, mask)
        if exclude_self:
            d2 = _mask_diagonal(d2)
        return jax.scipy.special.logsumexp(-d2 * inv, axis=1)

    nt = x_test.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, x_test.dtype)

    def body(carry, d2, cols):
        m_run, s_run = carry  # running max and rescaled sumexp, (nt,)
        logk = jnp.where(cols < n_tr, -d2 * inv, neg_inf)
        if exclude_self:
            rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
            logk = jnp.where(rows == cols, neg_inf, logk)
        m_blk = jnp.max(logk, axis=1)
        m_new = jnp.maximum(m_run, m_blk)
        # rescale both the carry and the block to the new max; exp(-inf
        # - -inf) cannot occur: every block holds >= 1 real column
        # (block length >= 512 and only the LAST block is padded), so
        # m_new > -inf from block 0 onward
        s_blk = jnp.sum(jnp.exp(logk - m_new[:, None]), axis=1)
        s_new = s_run * jnp.exp(m_run - m_new) + s_blk
        return (m_new, s_new)

    init = (
        jnp.full((nt,), -jnp.inf, x_test.dtype),
        jnp.zeros((nt,), x_test.dtype),
    )
    m_run, s_run = _scan_masked_d2_blocks(x_test, x_train, mask, body, init)
    return m_run + jnp.log(s_run)


def kde_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, bandwidth: float = 1.0, exclude_self: bool = False,
) -> jax.Array:
    """Negative Gaussian-KDE log-density in the masked subspace (pyod
    pyod.models.kde / sklearn KernelDensity semantics — the probabilistic
    density base family; reference capability via the pyod pin at
    requirements.txt:58).

    ``-log p(x)`` with ``p(x) = mean_j N(x; train_j, h^2 I)`` restricted to
    the masked dims: ``-(logsumexp_j(-d2_m/(2h^2)) - log n
    - (d_sub/2) log(2 pi h^2))``. The pairwise term rides the same masked
    squared-distance MXU matmul as the neighbor bases, streamed in train
    blocks past ``STREAM_NTR`` (running-max logsumexp carry).
    ``exclude_self`` drops the positional (i, i) pair and divides by
    ``n - 1``. For a full mask this equals
    ``-sklearn.neighbors.KernelDensity(bandwidth=h).score_samples``
    exactly. ``k`` is ignored (signature parity)."""
    del k
    mask_f = mask.astype(x_train.dtype)
    n_tr = x_train.shape[0]
    d_sub = jnp.sum(mask_f)
    ll = _kde_log_kernel_sum(x_test, x_train, mask, bandwidth, exclude_self)
    n_eff = max(n_tr - 1, 1) if exclude_self else n_tr
    log_norm = jnp.log(jnp.asarray(float(n_eff), x_train.dtype)) + (
        0.5 * d_sub * jnp.log(2.0 * jnp.pi * bandwidth * bandwidth)
    )
    return -(ll - log_norm)


@functools.lru_cache(maxsize=None)
def _kde_scorer(bandwidth: float, exclude_self: bool):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        kde_scores_masked, bandwidth=bandwidth, exclude_self=exclude_self,
    )


def loda_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_projections: int = 100, n_bins: int = 10, seed: int = 0,
) -> jax.Array:
    """LODA (Pevny 2016, pyod.models.loda) in the masked subspace: project
    onto ``n_projections`` random directions, fit an equal-width histogram
    per direction on the train projections, score a point by the mean
    negative log density of its bins. Part of the reference's downstream
    detector surface via the pyod/suod pins (requirements.txt:58,68 — LODA
    is a canonical suod ensemble member).

    TPU-native shape: the projections for EVERY mask share one dense
    N(0, 1) matrix ``W (d, P)`` (generated from ``seed``, so vmap over
    masks hoists it), masked per subspace as ``W .* m`` — both the train
    and test projections are single MXU matmuls, and the histogram
    build/lookup is ``n_bins`` unrolled elementwise+reduce passes (no
    scatter, no (n, P, B) one-hot ever materializes).

    Divergences vs pyod's LODA (documented): projections are DENSE rather
    than sqrt(d)-sparse — sparsity is a CPU speed trick that interacts
    badly with masking (a sparse direction whose support misses the mask
    dies), while the mask already sparsifies the dense direction; and test
    values outside the train range get the floor density (maximal score),
    matching this module's HBOS out-of-range policy.

    ``k`` is ignored (signature parity with the neighbor scorers). Memory
    is O((nt + ntr) x P) per in-flight mask.
    """
    del k
    eps = 1e-12
    mask_f = mask.astype(x_train.dtype)
    n_tr = x_train.shape[0]
    w = jax.random.normal(
        jax.random.PRNGKey(seed), (x_train.shape[1], n_projections),
        x_train.dtype,
    )
    wm = w * mask_f[:, None]
    z_tr = jnp.dot(x_train, wm, preferred_element_type=x_train.dtype)
    z_te = jnp.dot(x_test, wm, preferred_element_type=x_train.dtype)
    lo = jnp.min(z_tr, axis=0)
    hi = jnp.max(z_tr, axis=0)
    width = jnp.maximum((hi - lo) / n_bins, eps)
    idx_tr = jnp.clip(((z_tr - lo) / width).astype(jnp.int32), 0, n_bins - 1)
    idx_te = jnp.clip(((z_te - lo) / width).astype(jnp.int32), 0, n_bins - 1)
    density_te = jnp.zeros_like(z_te)
    for b in range(n_bins):
        count_b = jnp.sum((idx_tr == b).astype(x_train.dtype), axis=0)
        dens_b = count_b / (n_tr * width)
        density_te = density_te + jnp.where(
            idx_te == b, dens_b[None, :], 0.0
        )
    in_range = (z_te >= lo[None, :]) & (z_te <= hi[None, :])
    nll = -jnp.log(jnp.where(in_range, density_te, 0.0) + eps)
    return jnp.mean(nll, axis=1)


@functools.lru_cache(maxsize=None)
def _loda_scorer(n_projections: int, n_bins: int, seed: int):
    """Module-level memo so every (P, B, seed) combination is ONE hashable
    static — the jitted ensemble paths cache-hit across calls."""
    return functools.partial(
        loda_scores_masked,
        n_projections=n_projections, n_bins=n_bins, seed=seed,
    )


def inne_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_estimators: int = 100, psi: int = 8, seed: int = 0,
) -> jax.Array:
    """INNE — isolation using nearest-neighbor ensembles (Bandaragoda et
    al. 2018; pyod.models.inne) in the masked subspace. Part of the
    reference's downstream detector surface via the pyod/suod pins
    (requirements.txt:58,68 — INNE is a canonical isolation-family
    member alongside iforest).

    Each of ``n_estimators`` members subsamples ``psi`` train rows as
    hypersphere centers; a center's squared radius is its squared distance
    to its nearest fellow center, and its isolation ratio is
    ``1 - r2[nn(c)] / r2[c]``. A query covered by at least one ball takes
    the ratio of the smallest covering ball (ties: lowest index, as
    pyod's nanargmin); an uncovered query scores 1 (maximal). The final
    score is the mean over members. All distances stay SQUARED end to
    end — pyod's implementation runs sklearn ``euclidean_distances(...,
    squared=True)`` throughout, so coverage tests and radius ratios match
    that convention.

    TPU-native shape: the (n_estimators, psi) center subsample is drawn
    host-side from ``seed`` at trace time and shared across ALL masks
    (vmap hoists the gather); the center-center distances are ONE batched
    (T, psi, d)@(T, d, psi) MXU matmul and the query-center distances one
    (nt, d)@(d, T*psi) matmul per mask chunk. The covering-ball argmin is
    a psi-wide one-hot reduce — no per-row gathers. Memory is
    O((nt + d) x T x psi) per in-flight mask.

    Divergence vs pyod (documented): duplicate sampled centers give a
    zero radius, where pyod emits NaN/inf ratios (0/0); here the ratio is
    guarded to 1 (maximally isolated — a zero-radius ball covers only
    exact duplicates of an isolated pair). ``k`` is ignored (signature
    parity with the neighbor scorers).
    """
    del k
    ntr, d = x_train.shape
    psi_eff = min(int(psi), int(ntr))
    if psi_eff < 2:
        raise ValueError(
            f"inne needs at least 2 train rows to define ball radii; got "
            f"n_train={ntr} (psi={psi})"
        )
    t = int(n_estimators)
    # trace-time host draw: (T, psi) indices without replacement per
    # member, embedded as constants — deterministic per seed, shared
    # across every mask in the vmap (the loda projection-matrix pattern)
    host_rng = np.random.default_rng(seed)
    idx = np.stack(
        [host_rng.choice(ntr, size=psi_eff, replace=False) for _ in range(t)]
    ).astype(np.int32)
    centers = x_train[jnp.asarray(idx.reshape(-1))]  # (T*psi, d)
    mask_f = mask.astype(x_test.dtype)
    cm = centers * mask_f[None, :]
    sq_c = jnp.sum(cm * cm, axis=1)  # (T*psi,)
    cm_t = cm.reshape(t, psi_eff, d)
    sq_t = sq_c.reshape(t, psi_eff)
    gram = jnp.einsum(
        "tpd,tqd->tpq", cm_t, cm_t, preferred_element_type=x_test.dtype
    )
    d2_cc = jnp.maximum(
        sq_t[:, :, None] + sq_t[:, None, :] - 2.0 * gram, 0.0
    )
    big = jnp.asarray(jnp.finfo(x_test.dtype).max / 4, x_test.dtype)
    d2_cc = jnp.where(jnp.eye(psi_eff, dtype=bool)[None], big, d2_cc)
    r2 = jnp.min(d2_cc, axis=2)  # (T, psi) squared ball radii
    nn = jnp.argmin(d2_cc, axis=2)
    r2_nn = jnp.take_along_axis(r2, nn, axis=1)
    ratio = 1.0 - r2_nn / jnp.maximum(r2, jnp.asarray(1e-30, x_test.dtype))
    # masked query-center distances: mask is 0/1 so x . (m .* c) ==
    # (m .* x) . (m .* c) — one unmasked matmul against the masked centers
    nt = x_test.shape[0]
    sq_x = jnp.dot(x_test * x_test, mask_f)  # (nt,)
    d2_q = jnp.maximum(
        sq_x[:, None] + sq_c[None, :]
        - 2.0 * jnp.dot(x_test, cm.T, preferred_element_type=x_test.dtype),
        0.0,
    ).reshape(nt, t, psi_eff)
    covered = d2_q <= r2[None]
    sel = jnp.argmin(jnp.where(covered, r2[None], big), axis=2)  # (nt, T)
    onehot = sel[..., None] == jnp.arange(psi_eff)[None, None]
    ratio_sel = jnp.sum(jnp.where(onehot, ratio[None], 0.0), axis=2)
    score_t = jnp.where(jnp.any(covered, axis=2), ratio_sel, 1.0)
    return jnp.mean(score_t, axis=1)


@functools.lru_cache(maxsize=None)
def _inne_scorer(n_estimators: int, psi: int, seed: int):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        inne_scores_masked, n_estimators=n_estimators, psi=psi, seed=seed,
    )


def pca_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_components: int = 0, n_selected: int = 0,
    standardize: bool = True, weighted: bool = True,
) -> jax.Array:
    """pyod's PCA outlier detector (pyod.models.pca; Shyu et al. 2003) in
    the masked subspace. Part of the reference's downstream detector
    surface via the pyod/suod pins (requirements.txt:58,68 — PCA is the
    canonical reconstruction-family baseline in the paper's experiment
    grids).

    pyod's exact recipe, quirks included: standardize with the train
    column mean/std (sklearn StandardScaler, ddof=0; constant columns get
    scale 1), fit PCA on the standardized train block, then score a query
    as the sum over selected components of the plain Euclidean distance
    from the standardized query to the component VECTOR treated as a
    point in feature space — ``sum_j ||z - v_j|| / w_j`` with ``w_j`` the
    component's explained-variance ratio. Two replicated quirks: the
    query is standardized but NOT centered by PCA's own mean (visible
    when ``standardize=False``), and ``n_selected`` takes components from
    the SMALLEST-variance end of the kept list
    (``components_[-n_selected:]``), pyod's actual default slice.
    Component signs follow modern sklearn's ``svd_flip``
    (``u_based_decision=False``, the PCA convention since sklearn 1.5):
    each component is flipped so its largest-absolute coefficient is
    positive — signs matter here because the score measures distance to
    the component treated as a POINT, not a line.

    TPU-native shape: the masked covariance is one (d, d) MXU matmul per
    mask, the spectrum one batched ``eigh`` (vmap over masks), and the
    query-component distances ride ``||z||^2 + 1 - 2 z @ V`` — a single
    (nt, d) matmul. Masked-out dims standardize to exact zeros, so their
    eigenpairs carry (numerically) zero variance and are dropped by the
    validity threshold below; everything stays full-d with no dynamic
    shapes.

    Divergence vs pyod (documented): numerically-zero-variance directions
    (masked-out dims, exactly collinear or constant features) are
    EXCLUDED from the component list (threshold ``1e-5 * lambda_max``)
    rather than kept with ratio ~0 — pyod would divide by ~0 and let
    float noise dominate the score. ``n_components``/``n_selected`` of 0
    mean "all valid" (pyod's None). ``k`` is ignored (signature parity).
    """
    del k
    dt = x_test.dtype
    ntr, d = x_train.shape
    if ntr < 2:
        raise ValueError(
            f"pca needs at least 2 train rows to define a covariance; "
            f"got n_train={ntr}"
        )
    mask_f = mask.astype(dt)
    xm_tr = x_train * mask_f[None, :]
    mu = jnp.mean(xm_tr, axis=0)
    if standardize:
        # StandardScaler: ddof=0 std, constant columns keep scale 1 —
        # masked-out columns are exactly zero, so mu=0, var=0, scale=1
        # and the standardized column stays exactly 0
        scale = jnp.sqrt(jnp.mean((xm_tr - mu[None, :]) ** 2, axis=0))
        scale = jnp.where(scale > 0.0, scale, 1.0)
    else:
        mu = jnp.zeros_like(mu)
        scale = jnp.ones_like(mu)
    z_tr = (xm_tr - mu[None, :]) / scale[None, :]
    z_te = (x_test * mask_f[None, :] - mu[None, :]) / scale[None, :]
    # PCA centers internally; the scorer's queries stay UNcentered (pyod
    # runs cdist on the scaler output, not on PCA-transformed data)
    pmu = jnp.mean(z_tr, axis=0)
    z_trc = z_tr - pmu[None, :]
    cov = jnp.dot(
        z_trc.T, z_trc, preferred_element_type=dt
    ) / max(ntr - 1, 1)
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    evals = jnp.maximum(evals[::-1], 0.0)  # descending, clipped
    v = evecs[:, ::-1]  # columns = components, variance-descending
    # sklearn svd_flip (u_based_decision=False, PCA's convention since
    # sklearn 1.5): flip each component so its largest-|coefficient|
    # entry is positive; argmax ties resolve to the first row, as
    # numpy's do
    i_star = jnp.argmax(jnp.abs(v), axis=0)
    sgn = jnp.sign(
        jnp.take_along_axis(v, i_star[None, :], axis=0)[0]
    )
    v = v * jnp.where(sgn == 0.0, 1.0, sgn)[None, :]
    tot = jnp.sum(evals)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    valid = evals > jnp.maximum(evals[0] * 1e-5, tiny)
    r = jnp.sum(valid.astype(jnp.int32))
    # pyod's selection: keep the top n_components, then take the LAST
    # n_selected of those (smallest variance); 0 means all
    n_comp = jnp.minimum(n_components, r) if n_components > 0 else r
    n_sel = jnp.minimum(n_selected, n_comp) if n_selected > 0 else n_comp
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1  # 0-based among valid
    selected = valid & (rank >= n_comp - n_sel) & (rank < n_comp)
    ratio = evals / jnp.maximum(tot, tiny)
    coeff = selected.astype(dt)
    if weighted:
        coeff = coeff / jnp.maximum(ratio, jnp.asarray(1e-12, dt))
    # ||z - v_j|| with unit ||v_j||: sq + 1 - 2 z.v — one (nt, d) matmul
    sq_x = jnp.sum(z_te * z_te, axis=1)
    zv = jnp.dot(z_te, v, preferred_element_type=dt)
    dist = jnp.sqrt(jnp.maximum(sq_x[:, None] + 1.0 - 2.0 * zv, 0.0))
    return jnp.dot(dist, coeff, preferred_element_type=dt)


@functools.lru_cache(maxsize=None)
def _pca_scorer(
    n_components: int, n_selected: int, standardize: bool, weighted: bool,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        pca_scores_masked, n_components=n_components, n_selected=n_selected,
        standardize=standardize, weighted=weighted,
    )


def sampling_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, subset_size: int = 20, seed: int = 0,
) -> jax.Array:
    """Sampling outlier detector (Sugiyama & Borgwardt 2013, "Rapid
    distance-based outlier detection via sampling"; pyod.models.sampling)
    in the masked subspace. Part of the reference's downstream detector
    surface via the pyod/suod pins (requirements.txt:58,68).

    pyod's recipe: draw ``subset_size`` train rows once at fit, score a
    query as its Euclidean distance to the NEAREST sampled row. The whole
    detector is one masked (nt, d)@(d, s) matmul + a min — the cheapest
    distance-based base, and the paper shows it is surprisingly
    competitive with full kNN.

    TPU-native shape: the subsample indices are drawn host-side from
    ``seed`` at trace time and shared across ALL masks (the
    loda/inne constant-embedding pattern; pyod draws once per fitted
    detector — one draw per ensemble instance mirrors that). Distances
    ride the usual ``||x||^2 + ||s||^2 - 2 x.s`` identity, so the only
    O(nt x s) work is a single MXU matmul per mask chunk.

    Divergence vs pyod (documented): ``subset_size > n_train`` clamps to
    n_train (pyod raises); a train row that IS a sampled row scores 0
    against itself, as pyod's does. ``k`` is ignored (signature parity).
    """
    del k
    ntr, d = x_train.shape
    if ntr < 1:
        raise ValueError(f"sampling needs at least 1 train row; got {ntr}")
    s_eff = max(1, min(int(subset_size), int(ntr)))
    host_rng = np.random.default_rng(seed)
    idx = host_rng.choice(ntr, size=s_eff, replace=False).astype(np.int32)
    subset = x_train[jnp.asarray(idx)]  # (s, d)
    d2 = _masked_sq_dists(x_test, subset, mask)
    return jnp.sqrt(jnp.min(d2, axis=1))


def sod_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 20,
    *, ref_set: int = 10, alpha: float = 0.8, exclude_self: bool = False,
) -> jax.Array:
    """Subspace Outlier Detection (Kriegel et al. 2009, "Outlier
    detection in axis-parallel subspaces of high dimensional data";
    pyod.models.sod) in the masked subspace. Part of the reference's
    downstream detector surface via the pyod pin (requirements.txt:58)
    — and the thematically central baseline: SOD is the axis-parallel
    subspace-search family the V-GAN paper positions itself against.

    pyod's recipe: each query's reference set is the ``ref_set`` points
    with the highest shared-nearest-neighbor similarity (overlap of
    k-nearest-neighbor lists); within the reference set, a dimension is
    RELEVANT when its variance is below ``alpha * mean_variance``; the
    score is the distance to the reference mean restricted to the
    relevant dimensions, normalized by their count:
    ``sqrt(sum_j ind_j (x_j - mean_j)^2 / rel_dim)`` (0 when no
    dimension qualifies, as pyod's branch does). ``k`` is pyod's
    n_neighbors (the ensemble's ``k`` flows here).

    Novelty-style adaptation (documented divergence): pyod's ``_sod``
    is transductive — it scores X against X. Here queries score against
    the TRAIN set (kNN lists of train rows are self-excluded; a query's
    list self-excludes only when ``exclude_self`` marks the positional
    overlap, pyod's unsupplied-X convention — the same contract as the
    lof/knn bases). Masked-out dimensions carry zero variance and would
    always pass the variance test; they are excluded from the relevant
    set (their deviation term is exactly 0 anyway, but they must not
    inflate ``rel_dim``).

    TPU-native shape: both kNN searches ride the masked squared-distance
    MXU matmuls; the SNN similarity is ONE (nt, ntr)@(ntr, ntr) matmul
    of 0/1 neighbor-indicator matrices (built by scatter, resident per
    mask); reference rows gather as an (nt, ref_set, d) block (the
    abod/cof pattern, governed below).
    """
    dt = x_test.dtype
    ntr, d = x_train.shape
    k_eff = int(k)
    if k_eff < 1 or k_eff >= ntr:
        raise ValueError(
            f"sod needs 1 <= k < n_train neighbors (pyod clamps the "
            f"same way); got k={k} with n_train={ntr}"
        )
    r_eff = min(int(ref_set), ntr)
    if r_eff < 1:
        raise ValueError(f"ref_set must be >= 1; got {ref_set!r}")
    mask_f = mask.astype(dt)
    xm = x_train * mask_f[None, :]
    nt = x_test.shape[0]

    d2_tr = _masked_sq_dists(x_train, x_train, mask)
    d2_tr = _mask_diagonal(d2_tr)  # train kNN lists self-exclude
    _, idx_tr = jax.lax.approx_min_k(d2_tr, k_eff, recall_target=1.0)
    d2_te = _masked_sq_dists(x_test, x_train, mask)
    if exclude_self:
        d2_te = _mask_diagonal(d2_te)
    _, idx_te = jax.lax.approx_min_k(d2_te, k_eff, recall_target=1.0)

    # 0/1 neighbor indicators; SNN counts = one MXU matmul
    t_ind = jnp.zeros((ntr, ntr), dt).at[
        jnp.arange(ntr)[:, None], idx_tr
    ].set(1.0)
    q_ind = jnp.zeros((nt, ntr), dt).at[
        jnp.arange(nt)[:, None], idx_te
    ].set(1.0)
    snn = jnp.dot(q_ind, t_ind.T, preferred_element_type=dt)  # (nt, ntr)
    if exclude_self:
        snn = _mask_diagonal(-snn)  # +big on (i, i): drop from top-R
        snn = -snn
    # SNN counts are small integers, so top-R ties are everywhere; bias
    # by -index/(2 ntr) (< the count gap of 1) so the LOWEST index wins
    # every tie — a deterministic order the oracle can transcribe
    snn = snn - jnp.arange(ntr, dtype=dt)[None, :] * (0.5 / ntr)
    _, ref_idx = jax.lax.approx_min_k(-snn, r_eff, recall_target=1.0)

    ref = xm[ref_idx]  # (nt, R, d)
    means = jnp.mean(ref, axis=1)  # (nt, d)
    var = jnp.mean((ref - means[:, None, :]) ** 2, axis=1)  # (nt, d)
    d_sub = jnp.maximum(jnp.sum(mask_f), 1.0)
    var_expect = alpha * jnp.sum(var, axis=1, keepdims=True) / d_sub
    ind = (var < var_expect) & (mask_f[None, :] > 0)
    rel = jnp.sum(ind.astype(dt), axis=1)
    dev = jnp.sum(
        ind.astype(dt) * (x_test * mask_f[None, :] - means) ** 2, axis=1
    )
    return jnp.where(
        rel > 0, jnp.sqrt(dev / jnp.maximum(rel, 1.0)), 0.0
    )


@functools.lru_cache(maxsize=None)
def _sod_scorer(ref_set: int, alpha: float, exclude_self: bool):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        sod_scores_masked, ref_set=ref_set, alpha=alpha,
        exclude_self=exclude_self,
    )


def kpca_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, n_components: int = 0, gamma: float = 0.0,
    sampling: bool = False, subset_size: int = 20, seed: int = 0,
) -> jax.Array:
    """Kernel-PCA novelty detection (Hoffmann 2007, "Kernel PCA for
    novelty detection"; the recipe pyod.models.kpca implements) in the
    masked subspace, RBF kernel. Part of the reference's downstream
    detector surface via the pyod/suod pins (requirements.txt:58,68).

    The score is the squared reconstruction error in feature space: the
    spherical potential ``p(x) = ||phi(x) - phi_bar||^2`` (in kernel
    terms ``k(x,x) - (2/n) sum_j k(x, x_j) + (1/n^2) sum_ij k(x_i,
    x_j)``) minus the squared projections onto the leading kernel
    principal components (eigenvectors of the double-centered train
    kernel, projections scaled by ``1/sqrt(lambda_f)`` as sklearn
    KernelPCA's transform does). For a train point with all components
    kept the score is ~0; novel points leave energy orthogonal to the
    learned subspace. Component signs cancel in the square, so
    sklearn's svd_flip is irrelevant here.

    TPU-native shape: both kernels ride the masked
    ``||a||^2 + ||b||^2 - 2 a.b`` identity — (ntr, d)@(d, ntr) and
    (nt, d)@(d, ntr) MXU matmuls — and the spectrum is one batched
    ``eigh`` vmapped over masks. ``gamma=0.0`` means pyod's None:
    ``1 / n_features`` of the PROJECTED data, i.e. ``1 / popcount(mask)``
    per subspace (the convention every masked base here follows — the
    detector sees only the selected dims). ``sampling=True`` fits on a
    host-drawn ``subset_size`` train subsample shared across masks
    (pyod's own escape hatch for the O(n^2) kernel; seed from ``seed``),
    bounding the eigh at (s, s).

    Divergence vs pyod (documented): numerically-zero eigenvalues are
    excluded by a relative threshold (``1e-5 * lambda_max``) rather than
    sklearn's exact ``> 0`` cut — in f32 the near-null spectrum is noise
    amplified by the ``1/sqrt(lambda)`` scaling; ``n_components=0``
    means "all valid" (pyod's None). ``k`` is ignored (signature
    parity).
    """
    del k
    dt = x_test.dtype
    ntr_full = x_train.shape[0]
    if sampling:
        s_eff = max(2, min(int(subset_size), int(ntr_full)))
        host_rng = np.random.default_rng(seed)
        idx = host_rng.choice(
            ntr_full, size=s_eff, replace=False
        ).astype(np.int32)
        x_fit = x_train[jnp.asarray(idx)]
    else:
        x_fit = x_train
    n = x_fit.shape[0]
    if n < 2:
        raise ValueError(
            f"kpca needs at least 2 fit rows to define a kernel "
            f"spectrum; got n_train={n}"
        )
    mask_f = mask.astype(dt)
    if gamma > 0.0:
        g = jnp.asarray(gamma, dt)
    else:
        # pyod/sklearn None: 1/n_features of the projected data
        g = 1.0 / jnp.maximum(jnp.sum(mask_f), 1.0)
    k_tr = jnp.exp(-g * _masked_sq_dists(x_fit, x_fit, mask))  # (n, n)
    k_te = jnp.exp(-g * _masked_sq_dists(x_test, x_fit, mask))  # (nt, n)
    row_mean = jnp.mean(k_tr, axis=0)  # (n,) == col mean (symmetric)
    all_mean = jnp.mean(row_mean)
    kc_tr = k_tr - row_mean[None, :] - row_mean[:, None] + all_mean
    evals, evecs = jnp.linalg.eigh(kc_tr)  # ascending
    evals = jnp.maximum(evals[::-1], 0.0)
    alphas = evecs[:, ::-1]  # unit-norm columns, variance-descending
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    valid = evals > jnp.maximum(evals[0] * 1e-5, tiny)
    r = jnp.sum(valid.astype(jnp.int32))
    n_comp = jnp.minimum(n_components, r) if n_components > 0 else r
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    selected = valid & (rank < n_comp)
    # centered test kernel (KernelCenterer transform)
    kc_te = (
        k_te - jnp.mean(k_te, axis=1, keepdims=True)
        - row_mean[None, :] + all_mean
    )
    # projections onto selected components: (nt, n) @ (n, n) / sqrt(l)
    proj = jnp.dot(kc_te, alphas, preferred_element_type=dt)
    proj_sq = jnp.where(
        selected[None, :], proj * proj / jnp.maximum(evals, tiny)[None, :],
        0.0,
    )
    # spherical potential: k(x,x)=1 for rbf
    potential = 1.0 - 2.0 * jnp.mean(k_te, axis=1) + all_mean
    return potential - jnp.sum(proj_sq, axis=1)


@functools.lru_cache(maxsize=None)
def _kpca_scorer(
    n_components: int, gamma: float, sampling: bool, subset_size: int,
    seed: int,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        kpca_scores_masked, n_components=n_components, gamma=gamma,
        sampling=sampling, subset_size=subset_size, seed=seed,
    )


@functools.lru_cache(maxsize=None)
def _sampling_scorer(subset_size: int, seed: int):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        sampling_scores_masked, subset_size=subset_size, seed=seed,
    )


def ocsvm_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, nu: float = 0.5, gamma: float = 0.0, iters: int = 300,
) -> jax.Array:
    """One-class SVM (Schölkopf et al. 2001; pyod.models.ocsvm wraps
    sklearn.svm.OneClassSVM) in the masked subspace, RBF kernel. Part of
    the reference's downstream detector surface via the pyod pin
    (requirements.txt:58) — one of the oldest canonical pyod families and
    a standard member of suod-style heterogeneous pools.

    Solves the EXACT one-class dual QP libsvm solves —
    ``min 0.5 a^T K a`` over the capped simplex
    ``{0 <= a_i <= 1/(nu n), sum a = 1}`` — but with a fixed-iteration
    solver so the whole ensemble stays ONE compiled program: projected
    FISTA, step ``1/lambda_max(K)`` from 30 power iterations, with the
    capped-simplex projection by 60-step bisection on the shift. The
    offset ``rho`` is the mean of ``(K a)_i`` over margin support vectors
    (``0 < a_i < C``, tolerance ``1e-3 C``; plain SVs as fallback),
    matching libsvm's intercept rule. Scores follow pyod's convention
    (higher = more anomalous): ``(rho - K_test a) * (nu n)`` — the
    ``nu n`` factor converts to libsvm's alpha scaling so values equal
    sklearn's negated ``decision_function``, not just its ranking.

    TPU-native shape: the kernels ride the masked matmul identity
    ((ntr, d)@(d, ntr) / (nt, d)@(d, ntr) MXU matmuls); power iteration,
    bisection, and FISTA are fixed-length ``lax.scan`` whose body is one
    (ntr, ntr)@(ntr,) matvec — ``vmap`` over masks turns those into
    batched (chunk, ntr, ntr)@(chunk, ntr) contractions. No
    data-dependent control flow, so thousands of per-subspace SVMs train
    in one launch (the ae/dsvdd in-program-training pattern).

    Measured accuracy vs sklearn OneClassSVM (tests/test_sklearn_parity):
    at ``iters=300`` decision values agree to ~2e-4 relative, support-
    vector counts exactly, over n in [60, 400] and nu in [0.1, 0.9].
    ``gamma=0.0`` means pyod's 'auto': ``1 / popcount(mask)`` per
    subspace (the projected-data convention every masked base follows).
    ``k`` is ignored (signature parity).
    """
    del k
    dt = x_test.dtype
    ntr = x_train.shape[0]
    if ntr < 2:
        raise ValueError(
            f"ocsvm needs at least 2 train rows; got n_train={ntr}"
        )
    if not 0.0 < nu <= 1.0:
        raise ValueError(
            f"nu must be in (0, 1] (Schölkopf's outlier-fraction bound); "
            f"got {nu!r}"
        )
    mask_f = mask.astype(dt)
    if gamma > 0.0:
        g = jnp.asarray(gamma, dt)
    else:
        g = 1.0 / jnp.maximum(jnp.sum(mask_f), 1.0)
    k_tr = jnp.exp(-g * _masked_sq_dists(x_train, x_train, mask))
    k_te = jnp.exp(-g * _masked_sq_dists(x_test, x_train, mask))
    c_cap = jnp.asarray(1.0 / (nu * ntr), dt)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

    def power_step(b, _):
        b = jnp.dot(k_tr, b, preferred_element_type=dt)
        return b / (jnp.linalg.norm(b) + tiny), None

    b0 = jnp.ones((ntr,), dt) / jnp.sqrt(jnp.asarray(ntr, dt))
    b, _ = jax.lax.scan(power_step, b0, None, length=30)
    lmax = jnp.dot(b, jnp.dot(k_tr, b, preferred_element_type=dt))
    step = 1.0 / (lmax * 1.02 + tiny)

    def project(v):
        def bisect(carry, _):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            s = jnp.sum(jnp.clip(v - mid, 0.0, c_cap))
            return (jnp.where(s > 1.0, mid, lo),
                    jnp.where(s > 1.0, hi, mid)), None

        (lo, hi), _ = jax.lax.scan(
            bisect, (jnp.min(v) - c_cap, jnp.max(v)), None, length=60
        )
        return jnp.clip(v - 0.5 * (lo + hi), 0.0, c_cap)

    def fista_step(carry, _):
        a, y, t = carry
        grad = jnp.dot(k_tr, y, preferred_element_type=dt)
        a_new = project(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = a_new + ((t - 1.0) / t_new) * (a_new - a)
        return (a_new, y_new, t_new), None

    a0 = jnp.full((ntr,), 1.0 / ntr, dt)
    (alpha, _, _), _ = jax.lax.scan(
        fista_step, (a0, a0, jnp.asarray(1.0, dt)), None, length=iters
    )

    f_tr = jnp.dot(k_tr, alpha, preferred_element_type=dt)
    tol = c_cap * 1e-3
    margin = (alpha > tol) & (alpha < c_cap - tol)
    sv = alpha > tol
    n_margin = jnp.sum(margin.astype(dt))
    rho_margin = jnp.sum(jnp.where(margin, f_tr, 0.0)) / jnp.maximum(
        n_margin, 1.0
    )
    rho_sv = jnp.sum(jnp.where(sv, f_tr, 0.0)) / jnp.maximum(
        jnp.sum(sv.astype(dt)), 1.0
    )
    rho = jnp.where(n_margin > 0, rho_margin, rho_sv)
    f_te = jnp.dot(k_te, alpha, preferred_element_type=dt)
    return (rho - f_te) * jnp.asarray(nu * ntr, dt)


@functools.lru_cache(maxsize=None)
def _ocsvm_scorer(nu: float, gamma: float, iters: int):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        ocsvm_scores_masked, nu=nu, gamma=gamma, iters=iters,
    )


def sos_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, perplexity: float = 4.5, iters: int = 64,
    exclude_self: bool = False,
) -> jax.Array:
    """Stochastic Outlier Selection (Janssens et al. 2012; pyod sos /
    scikit-sos) in the masked subspace — the affinity-based probabilistic
    family (reference capability via the pyod pin at requirements.txt:58).

    The paper's chain on the projected dims: per-train-row affinities
    ``a_ij = exp(-d2_ij * beta_i)`` (eq. 2 with ``beta = 1/(2 sigma^2)``
    on squared masked distances), each ``beta_i`` tuned by a
    fixed-iteration bisection so the binding distribution's Shannon
    entropy hits ``log(perplexity)`` (the t-SNE-style search scikit-sos
    uses, here ``iters`` vectorized halving steps over all rows at once);
    binding probabilities ``b_ij = a_ij / sum_{k != i} a_ik``; outlier
    probability ``O(x) = prod_i (1 - b_{i,x})`` — the returned score, in
    [0, 1], higher = more outlying (pyod's orientation).

    TPU-native shape: the train affinity plane rides the masked
    squared-distance MXU matmul; the bisection is ``iters`` elementwise
    passes over the SHIFTED kernel ``exp(-(d2 - d2_min_row) beta)``
    (max entry 1 — no overflow at any beta); test binding goes through
    log-space (``logaddexp``) so near/far novel points never over/
    underflow. Everything is jnp ops, so ``vmap`` batches whole pools of
    masks.

    ``exclude_self=True`` (positionally self-aligned rows, e.g. the
    ``decision_scores_`` mixin) reproduces the paper's transductive
    recipe exactly: row t's own affinity column is dropped from both the
    binding sums and the product — pinned against a numpy-f64
    transcription of the published chain. Novel rows are scored by the
    novelty adaptation: x joins the set, ``b_{i,x} = a_{i,x} /
    (sum_{j != i} a_ij + a_{i,x})``, with the betas FROZEN at their
    train-tuned values (documented divergence: transductive SOS would
    re-tune perplexity over the union per query batch, which is
    batch-dependent; freezing makes scores per-point and serving-safe,
    the same novelty-style adaptation as the sod base).

    ``k`` is ignored (signature parity). Memory is O(ntr^2 + nt x ntr)
    per in-flight mask (see ``_effective_chunk``).
    """
    del k
    if x_train.shape[0] < 2:
        raise ValueError(
            f"sos needs at least 2 train rows (the binding distribution "
            f"is over the other points); got {x_train.shape[0]}"
        )
    if not perplexity < x_train.shape[0]:
        raise ValueError(
            f"sos needs perplexity < n_train (scikit-sos's constraint); "
            f"got perplexity={perplexity} with n_train={x_train.shape[0]}"
        )
    dtype = x_train.dtype
    n_tr = x_train.shape[0]
    d2_tr = _masked_sq_dists(x_train, x_train, mask)
    diag = jax.lax.broadcasted_iota(
        jnp.int32, d2_tr.shape, 0
    ) == jax.lax.broadcasted_iota(jnp.int32, d2_tr.shape, 1)
    # off-diagonal row minimum: the stable shift for the bisection kernel
    dmin = jnp.min(_mask_diagonal(d2_tr), axis=1)
    dshift = d2_tr - dmin[:, None]  # >= 0 off-diag; diag masked to -inf
    log_u = jnp.log(jnp.asarray(perplexity, dtype))
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def entropy_sumq(beta):
        expo = jnp.where(diag, -jnp.inf, -dshift * beta[:, None])
        q = jnp.exp(expo)
        sumq = jnp.maximum(jnp.sum(q, axis=1), tiny)
        h = jnp.log(sumq) + beta * jnp.sum(dshift * q, axis=1) / sumq
        return h, sumq

    def bisect(carry, _):
        beta, lo, hi = carry
        h, _ = entropy_sumq(beta)
        too_spread = h > log_u  # entropy too high -> sharpen: raise beta
        lo = jnp.where(too_spread, beta, lo)
        hi = jnp.where(too_spread, hi, beta)
        up = jnp.where(jnp.isinf(hi), beta * 2.0, 0.5 * (lo + hi))
        down = jnp.where(lo == 0.0, beta * 0.5, 0.5 * (lo + hi))
        return (jnp.where(too_spread, up, down), lo, hi), None

    (beta, _, _), _ = jax.lax.scan(
        bisect,
        (jnp.ones((n_tr,), dtype), jnp.zeros((n_tr,), dtype),
         jnp.full((n_tr,), jnp.inf, dtype)),
        None, length=iters,
    )
    _, sumq = entropy_sumq(beta)
    # log sum_{j != i} a_ij in UNshifted terms (a_ij = exp(-beta d2_ij))
    log_sum_a = -beta * dmin + jnp.log(sumq)

    d2_te = _masked_sq_dists(x_train, x_test, mask)  # (ntr, nt)
    log_a_te = -beta[:, None] * d2_te
    if exclude_self:
        # leading columns t < n_tr ARE train rows positionally: the
        # transductive formula applies (a_{t,t} is already absent from
        # log_sum_a; row t is dropped from column t's product). Trailing
        # columns (predict's concatenated novel rows) still score through
        # the novelty denominator.
        cols = jax.lax.broadcasted_iota(jnp.int32, d2_te.shape, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, d2_te.shape, 0)
        log_den = jnp.where(
            cols < n_tr, log_sum_a[:, None],
            jnp.logaddexp(log_sum_a[:, None], log_a_te),
        )
        b = jnp.exp(log_a_te - log_den)
        b = jnp.where(rows == cols, 0.0, b)
    else:
        # novelty: x joins the set, so its own affinity enters row i's
        # binding denominator
        b = jnp.exp(log_a_te - jnp.logaddexp(log_sum_a[:, None], log_a_te))
    b = jnp.clip(b, 0.0, 1.0)
    return jnp.exp(jnp.sum(jnp.log1p(-b), axis=0))


@functools.lru_cache(maxsize=None)
def _sos_scorer(perplexity: float, iters: int, exclude_self: bool):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        sos_scores_masked, perplexity=perplexity, iters=iters,
        exclude_self=exclude_self,
    )


_LMDD_BLOCK = 256  # train-row block for the aad deviation plane


def lmdd_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, dis_measure: str = "var", exclude_self: bool = False,
) -> jax.Array:
    """Deviation-based outlier detection (Arning, Agrawal & Raghavan
    1996; the pyod lmdd family) in the masked subspace.

    The paper's smoothing factor for an exception set ``I_j`` is
    ``SF(I_j) = C(I - I_j) * (D(I) - D(I - I_j))`` — how much the set's
    dissimilarity ``D`` drops (scaled by the remaining cardinality) when
    the candidates are removed. Per-point scores only need SINGLETON
    exception sets, for which the smoothing factor is closed-form:

    - positionally self-aligned rows (``exclude_self=True`` leading
      columns): ``(n-1) * max(D(X) - D(X \\ x), 0)`` — removing an
      outlier drops the dissimilarity;
    - novel rows: ``n * max(D(X + x) - D(X), 0)`` — adding an outlier
      raises it.

    ``dis_measure``: 'var' (mean per-dim variance over the masked dims —
    the paper's dissimilarity example for numeric data; leave-one-out
    closed-form from the masked sum/sum-of-squares, one (nt, d)
    elementwise pass) or 'aad' (mean absolute deviation about the
    per-dim mean, pyod's default measure; the leave-one-out mean shifts
    every deviation, so the deviation plane is recomputed in
    ``_LMDD_BLOCK``-row train blocks under ``lax.scan`` —
    O(ntr x nt x d) work per mask, O(block x nt x d) memory).

    Documented divergence vs pyod's lmdd: pyod APPROXIMATES smoothing
    factors by accumulating dissimilarity increments along ``n_iter``
    random orderings of the rows (the paper's linear-scan heuristic for
    finding exception SETS, which is inherently sequential and
    RNG-dependent). Per-point singleton smoothing factors need no
    ordering: this scorer computes them exactly and deterministically,
    so there is no ``n_iter``/``random_state`` and scores are
    permutation-free. The 'iqr' measure is not offered (leave-one-out
    quantiles do not vectorize into matmul shape).

    ``k`` is ignored (signature parity).
    """
    del k
    if dis_measure not in ("var", "aad"):
        raise ValueError(
            f"unknown dis_measure={dis_measure!r}: expected 'var' or "
            "'aad' ('iqr' is not offered — see the docstring)"
        )
    n = x_train.shape[0]
    if n < 2:
        raise ValueError(
            f"lmdd needs at least 2 train rows (leave-one-out "
            f"dissimilarity); got {n}"
        )
    dtype = x_train.dtype
    mask_f = mask.astype(dtype)
    d_act = jnp.maximum(jnp.sum(mask_f), 1.0)
    xm_tr = x_train * mask_f[None, :]
    xm_te = x_test * mask_f[None, :]
    s1 = jnp.sum(xm_tr, axis=0)  # (d,) masked column sums
    nf = jnp.asarray(float(n), dtype)
    mu = s1 / nf

    cols = jnp.arange(x_test.shape[0], dtype=jnp.int32)
    is_self = (
        (cols < n) if exclude_self
        else jnp.zeros_like(cols, dtype=bool)
    )
    # c = cardinality after the move: n+1 on addition, n-1 on removal.
    # The D differences below are computed in CLOSED FORM rather than as
    # D_eff - D_full of two separately rounded O(1) quantities — the
    # smoothing factor is O(1/n), so the naive difference loses ~n x
    # relative precision in f32 (observed: 4e-4 live-vs-export drift
    # before this form; the closed forms are algebraically identical).
    c_eff = jnp.where(is_self, nf - 1.0, nf + 1.0)
    dev_te = (xm_te - mu[None, :]) * mask_f[None, :]

    if dis_measure == "var":
        # centered one-pass variance (s2/n - mean^2 cancels for large
        # means); per-dim v = mean((x - mu)^2)
        v = jnp.sum(jnp.square(xm_tr - mu[None, :]) * mask_f, axis=0) / nf
        # exact update/downdate identities (m = full mean, v = full var):
        #   add x:    var' - var = (n (x-m)^2 / (n+1) - v) / (n+1)
        #   remove x: var - var' = (n (x-m)^2 / (n-1) - v) / (n-1)
        delta = jnp.sum(
            (nf * jnp.square(dev_te) / c_eff[:, None] - v[None, :])
            * mask_f[None, :], axis=1,
        ) / (c_eff * d_act)
        sf = delta
    else:
        # aad: the mean shift is O(1/n), so accumulate the PER-ELEMENT
        # deviation difference sum_i (|x_i - mu_eff| - |x_i - mu|)
        # (each term is a difference of close values — no large-sum
        # cancellation) in blocked train passes; own = |x - mu_eff|.
        #   add:    D' - D = (n dlt + n own - S) / (n (n+1) d_act)
        #   remove: D - D' = (-n dlt + n own - S) / (n (n-1) d_act)
        # and the final sf scale (n or n-1) cancels one denominator
        # factor (see below).
        s1_eff = jnp.where(
            is_self[:, None], s1[None, :] - xm_te, s1[None, :] + xm_te
        )
        mu_eff = s1_eff / c_eff[:, None]
        blk = _LMDD_BLOCK
        n_blocks = -(-n // blk)
        pad = n_blocks * blk - n
        xm_pad = jnp.pad(xm_tr, ((0, pad), (0, 0)))
        valid = jnp.pad(jnp.ones((n,), dtype), (0, pad))
        xm_blocks = xm_pad.reshape(n_blocks, blk, -1)
        v_blocks = valid.reshape(n_blocks, blk)

        def body(acc, blk_in):
            xb, vb = blk_in
            d_eff = jnp.abs(xb[:, None, :] - mu_eff[None, :, :])
            d_full = jnp.abs(xb[:, :] - mu[None, :])[:, None, :]
            diff = (d_eff - d_full) * mask_f[None, None, :]
            diff = diff * vb[:, None, None]
            s_full = jnp.sum(
                jnp.abs(xb - mu[None, :]) * mask_f[None, :]
                * vb[:, None]
            )
            return (acc[0] + jnp.sum(diff, axis=(0, 2)),
                    acc[1] + s_full), None

        (dlt, s_full), _ = jax.lax.scan(
            body,
            (jnp.zeros((x_test.shape[0],), dtype),
             jnp.zeros((), dtype)),
            (xm_blocks, v_blocks),
        )
        own = jnp.sum(jnp.abs(xm_te - mu_eff) * mask_f[None, :], axis=1)
        numer = jnp.where(is_self, -dlt, dlt) * nf + nf * own - s_full
        sf = numer / (nf * c_eff * d_act)

    # paper scale C(I - I_j): n on addition, n-1 on removal
    return jnp.maximum(sf, 0.0) * jnp.where(is_self, nf - 1.0, nf)


@functools.lru_cache(maxsize=None)
def _lmdd_scorer(dis_measure: str, exclude_self: bool):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        lmdd_scores_masked, dis_measure=dis_measure,
        exclude_self=exclude_self,
    )


def mcd_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, support_fraction: float = 0.0, n_starts: int = 8, c_steps: int = 15,
    seed: int = 0,
) -> jax.Array:
    """Minimum Covariance Determinant outlier detector (Rousseeuw & Van
    Driessen 1999 FastMCD; pyod.models.mcd wraps sklearn MinCovDet) in
    the masked subspace. Part of the reference's downstream detector
    surface via the pyod/suod pins (requirements.txt:58,68).

    sklearn's exact estimator recipe, replicated end to end: support size
    ``h = min(ceil(0.5 (n + p + 1)), n)`` with ``p`` the ACTIVE dim count
    (``support_fraction > 0`` overrides as ``int(f * n)``), c-steps that
    recompute the biased mean/covariance of the current h smallest
    Mahalanobis distances, the raw-estimate analytic consistency
    correction ``cov *= c(p, h/n)`` with
    ``c(p, a) = a / chi2.cdf(chi2.ppf(a, p), p + 2)`` (modern sklearn's
    ``_consistency_factor`` — the old median/chi2(0.5) recipe is gone),
    Rousseeuw reweighting (keep points with ``d^2 < chi2.ppf(0.975,
    p)``, biased covariance of the kept rows) scaled by the same factor
    at ``a = 0.975``, and finally the
    squared Mahalanobis distance of the queries to the reweighted
    estimates (``MinCovDet.mahalanobis`` — pyod MCD's
    decision_function). The chi-square quantile/cdf terms are
    host-precomputed tables over dof 1..d and indexed by ``popcount
    (mask)``, so every mask gets its own p-dependent thresholds inside
    one traced program.

    TPU-native shape: each c-step is one masked (d, d) covariance matmul
    + one Cholesky + one triangular solve batched over the train rows —
    the ``mahalanobis_scores_masked`` machinery under a ``lax.scan``;
    ``n_starts`` random starts run as a ``vmap`` with the winner chosen
    by masked log-determinant. The h-subset selection is a rank
    threshold (double argsort), so every step keeps EXACTLY h rows with
    ties broken by row index — no dynamic shapes. Initial subsets take
    the first ``p + 1`` rows of host-drawn permutations (seed from
    ``seed``, shared across masks; sklearn draws p+1-point subsets the
    same way per trial).

    Divergences vs sklearn (documented): fixed ``n_starts`` x
    ``c_steps`` instead of select_candidates' 30-trial/2-step/top-10
    tournament and the n>500 partitioning (on well-separated data both
    reach the same optimum — pinned by the cross-library test); the
    1-feature special case (shortest-half location) is not replicated
    (c-steps run as in the general case); rank-deficient subspaces lean
    on the same scale-aware ridge as ``mahalanobis_scores_masked``
    instead of sklearn's full-rank warning. ``k`` is ignored (signature
    parity).
    """
    del k
    from scipy.stats import chi2  # host-side tables only (sklearn dep)

    dt = x_test.dtype
    ntr, d = x_train.shape
    if ntr < 2:
        raise ValueError(
            f"mcd needs at least 2 train rows to define a covariance; "
            f"got n_train={ntr}"
        )
    dofs = np.arange(1, d + 1)

    def consistency(alpha: np.ndarray) -> np.ndarray:
        # sklearn _consistency_factor (Pison 2002 Sec 3 / Croux 1999
        # Eq 4.2); alpha -> 1 gives q -> inf, cdf -> 1, factor -> alpha
        q = chi2.ppf(np.clip(alpha, 0.0, 1.0), dofs)
        return alpha / np.where(
            np.isfinite(q), chi2.cdf(q, dofs + 2), 1.0
        )

    if support_fraction > 0.0:
        h_np = np.full(d, int(support_fraction * ntr))
    else:
        h_np = np.minimum(np.ceil(0.5 * (ntr + dofs + 1)).astype(int), ntr)
    corr_raw = jnp.asarray(consistency(h_np / ntr), dt)  # (d,) by dof
    chi2_rw = jnp.asarray(chi2.ppf(0.975, dofs), dt)
    c_alpha = jnp.asarray(consistency(np.full(d, 0.975)), dt)
    host_rng = np.random.default_rng(seed)
    perms = jnp.asarray(np.stack(
        [host_rng.permutation(ntr) for _ in range(int(n_starts))]
    ).astype(np.int32))  # (S, ntr)
    perm_rank = jnp.argsort(perms, axis=1)  # rank of row i in start s

    mask_f = mask.astype(dt)
    xm = x_train * mask_f[None, :]
    p_sub = jnp.maximum(jnp.sum(mask_f), 1.0)
    p_idx = jnp.clip(jnp.sum(mask).astype(jnp.int32) - 1, 0, d - 1)
    # the SAME per-dof table the consistency factor was built from, so
    # h and corr_raw can never disagree
    h = jnp.asarray(h_np.astype(np.int32))[p_idx]

    eye_unmasked = jnp.diag(1.0 - mask_f)
    mm = mask_f[:, None] * mask_f[None, :]

    def robust_cov(w):
        """Biased (1/sum w) masked covariance + Cholesky of the
        solvable embedding; returns (mu, chol, logdet_masked)."""
        sw = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.dot(w, xm) / sw
        xc = xm - mu[None, :]
        cov = jnp.dot(
            (w[:, None] * xc).T, xc, preferred_element_type=dt
        ) / sw
        cov = cov * mm
        ridge = jnp.maximum(1e-6 * jnp.trace(cov) / p_sub, 1e-12)
        cov = cov + eye_unmasked + ridge * jnp.diag(mask_f)
        chol = jnp.linalg.cholesky(cov)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol)) * mask_f
        )
        return mu, chol, logdet

    def maha(chol, mu, x):
        y = jax.lax.linalg.triangular_solve(
            chol, (x * mask_f[None, :] - mu[None, :]).T,
            left_side=True, lower=True,
        )
        return jnp.sum(y * y, axis=0)

    def h_smallest(d2):
        # exactly-h 0/1 weights: rank by value with index tiebreak
        order = jnp.argsort(d2)
        rank = jnp.argsort(order)
        return (rank < h).astype(dt)

    def one_start(rank0):
        w = (rank0 < jnp.minimum(
            jnp.sum(mask).astype(jnp.int32) + 1, ntr
        )).astype(dt)

        def step(w, _):
            mu, chol, _ = robust_cov(w)
            d2 = maha(chol, mu, x_train)
            return h_smallest(d2), None

        w_fin, _ = jax.lax.scan(step, w, None, length=int(c_steps))
        return w_fin, robust_cov(w_fin)[2]

    w_all, logdet_all = jax.vmap(one_start)(perm_rank)
    best = jnp.argmin(logdet_all)
    w_raw = jnp.sum(
        (jnp.arange(int(n_starts)) == best)[:, None].astype(dt) * w_all,
        axis=0,
    )
    # raw estimates + analytic consistency correction (cov *= corr <=>
    # dist /= corr, sklearn correct_covariance)
    mu_raw, chol_raw, _ = robust_cov(w_raw)
    d2_raw = maha(chol_raw, mu_raw, x_train)
    d2_c = d2_raw / jnp.maximum(corr_raw[p_idx], jnp.asarray(1e-30, dt))
    # Rousseeuw reweighting + Pison/Croux consistency at the normal
    w_rw = (d2_c < chi2_rw[p_idx]).astype(dt)
    mu_rw, chol_rw, _ = robust_cov(w_rw)
    # sklearn's covariance_ is the biased kept-row covariance times
    # c_alpha; the solve above used the unscaled covariance, so the
    # quadratic form divides by the same scalar
    return maha(chol_rw, mu_rw, x_test) / jnp.maximum(
        c_alpha[p_idx], jnp.asarray(1e-30, dt)
    )


def _adam_train(loss_fn, params, epochs: int, lr: float, dt):
    """Full-batch Adam as a pure ``lax.scan`` over any params pytree —
    the shared trainer of the in-program deep bases (ae/dsvdd). Standard
    bias-corrected moments, eps 1e-8."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, t):
        ps, m, v = carry
        g = jax.grad(loss_fn)(ps)
        m = jax.tree_util.tree_map(
            lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v = jax.tree_util.tree_map(
            lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
        tf = t.astype(dt) + 1.0
        sz = lr * jnp.sqrt(1.0 - b2 ** tf) / (1.0 - b1 ** tf)
        ps = jax.tree_util.tree_map(
            lambda p, mm, vv: p - sz * mm / (jnp.sqrt(vv) + eps),
            ps, m, v)
        return (ps, m, v), None

    (params, _, _), _ = jax.lax.scan(
        step, (params, zeros, zeros),
        jnp.arange(int(epochs), dtype=jnp.int32),
    )
    return params


def _masked_standardize(x_test, x_train, mask_f):
    """Train-scaler standardization on the masked dims (StandardScaler
    semantics: ddof-0 std, constant columns keep scale 1; masked-out
    columns come out exactly 0) — shared by the pca/ae/dsvdd bases."""
    xm_tr = x_train * mask_f[None, :]
    mu = jnp.mean(xm_tr, axis=0)
    scale = jnp.sqrt(jnp.mean((xm_tr - mu[None, :]) ** 2, axis=0))
    scale = jnp.where(scale > 0.0, scale, 1.0)
    z_tr = (xm_tr - mu[None, :]) / scale[None, :]
    z_te = (x_test * mask_f[None, :] - mu[None, :]) / scale[None, :]
    return z_tr, z_te


def ae_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, hidden: tuple = (64, 32), epochs: int = 50, lr: float = 1e-3,
    seed: int = 0,
) -> jax.Array:
    """AutoEncoder reconstruction-error outlier detector
    (pyod.models.auto_encoder — the canonical deep baseline in the
    paper's comparison family) in the masked subspace. Part of the
    reference's downstream detector surface via the pyod pin
    (requirements.txt:58).

    pyod's semantics: standardize with the train scaler, train a
    symmetric MLP autoencoder (``d -> hidden -> reversed(hidden) -> d``,
    ReLU between layers, linear output, Adam on MSE), score a query as
    the plain Euclidean distance between its standardized features and
    their reconstruction.

    TPU-native shape: training happens INSIDE the scorer — a
    ``lax.scan`` of ``epochs`` full-batch Adam steps whose forward/
    backward is a chain of (ntr, d)@(d, h) MXU matmuls — so ``vmap``
    over masks trains THOUSANDS of per-subspace autoencoders as one
    batched program (each mask gets its own weights; masked-out dims
    standardize to exact zeros, the reconstruction is re-masked, and the
    MSE normalizes by the ACTIVE dim count so every subspace sees the
    same effective learning rate). Initial weights are host-drawn
    Glorot-uniform constants from ``seed`` shared across masks (the
    loda/inne constant-embedding pattern).

    Divergences vs pyod (documented): full-batch Adam for a fixed
    ``epochs`` instead of minibatch shuffling with torch's loader; no
    dropout/batch-norm (pyod's defaults regularize its 32-row
    minibatches; full-batch training on standardized subspaces does not
    need them — and keeping the trainer a pure scan keeps the whole
    ensemble one compiled program). ``k`` is ignored (signature
    parity).
    """
    del k
    dt = x_test.dtype
    ntr, d = x_train.shape
    if ntr < 2:
        raise ValueError(
            f"ae needs at least 2 train rows to standardize; got "
            f"n_train={ntr}"
        )
    mask_f = mask.astype(dt)
    z_tr, z_te = _masked_standardize(x_test, x_train, mask_f)
    d_sub = jnp.maximum(jnp.sum(mask_f), 1.0)

    widths = [d, *[int(h) for h in hidden],
              *[int(h) for h in reversed(hidden)][1:], d]
    host_rng = np.random.default_rng(seed)
    params = []
    for w_in, w_out in zip(widths[:-1], widths[1:]):
        lim = float(np.sqrt(6.0 / (w_in + w_out)))
        params.append((
            jnp.asarray(host_rng.uniform(-lim, lim, (w_in, w_out)), dt),
            jnp.zeros((w_out,), dt),
        ))

    def forward(ps, z):
        a = z
        last = len(ps) - 1
        for i, (w, b) in enumerate(ps):
            a = jnp.dot(a, w, preferred_element_type=dt) + b
            if i < last:
                a = jax.nn.relu(a)
        return a * mask_f[None, :]

    def loss(ps):
        r = forward(ps, z_tr)
        return jnp.sum((r - z_tr) ** 2) / (ntr * d_sub)

    params = _adam_train(loss, params, epochs, lr, dt)
    r_te = forward(params, z_te)
    return jnp.sqrt(jnp.sum((r_te - z_te) ** 2, axis=1))


def dsvdd_scores_masked(
    x_test: jax.Array, x_train: jax.Array, mask: jax.Array, k: int = 0,
    *, hidden: tuple = (64, 32), epochs: int = 50, lr: float = 1e-3,
    weight_decay: float = 1e-5, seed: int = 0,
) -> jax.Array:
    """Deep SVDD one-class outlier detector (Ruff et al. 2018;
    pyod.models.deep_svdd) in the masked subspace. Part of the
    reference's downstream detector surface via the pyod pin
    (requirements.txt:58) — the second deep family alongside the
    autoencoder.

    Ruff's recipe: a BIAS-FREE MLP encoder (biases admit the trivial
    constant-map solution — Proposition 3 of the paper), the hypersphere
    center ``c`` frozen at the mean INITIAL embedding of the train set
    with near-zero coordinates snapped to ``+/- 0.1`` (pyod's eps
    trick, same trivial-solution guard), then minimize the mean squared
    embedding-to-center distance plus L2 weight decay. The outlier
    score is the squared distance of the query's embedding to ``c``.

    TPU-native shape: identical machinery to :func:`ae_scores_masked` —
    the training scan lives inside the scorer, host-Glorot init from
    ``seed``, vmap over masks trains one bias-free encoder per subspace
    as batched MXU matmuls. Standardization and MSE/active-dim
    normalization also mirror the ae base.

    Divergences vs pyod (documented): full-batch Adam for fixed
    ``epochs`` instead of minibatches; no dropout; pyod's optional
    ``use_ae`` reconstruction term is not carried (that variant is the
    'ae' base). ``k`` is ignored (signature parity).
    """
    del k
    dt = x_test.dtype
    ntr, d = x_train.shape
    if ntr < 2:
        raise ValueError(
            f"dsvdd needs at least 2 train rows to standardize; got "
            f"n_train={ntr}"
        )
    mask_f = mask.astype(dt)
    z_tr, z_te = _masked_standardize(x_test, x_train, mask_f)

    widths = [d, *[int(h) for h in hidden]]
    host_rng = np.random.default_rng(seed)
    params = []
    for w_in, w_out in zip(widths[:-1], widths[1:]):
        lim = float(np.sqrt(6.0 / (w_in + w_out)))
        params.append(
            jnp.asarray(host_rng.uniform(-lim, lim, (w_in, w_out)), dt)
        )

    def embed(ps, z):
        a = z
        last = len(ps) - 1
        for i, w in enumerate(ps):
            a = jnp.dot(a, w, preferred_element_type=dt)
            if i < last:
                a = jax.nn.relu(a)
        return a

    # center = mean initial embedding, eps-snapped away from 0 (Ruff's
    # guard against the all-zero collapse; pyod uses eps = 0.1)
    c0 = jnp.mean(embed(params, z_tr), axis=0)
    eps = jnp.asarray(0.1, dt)
    c = jnp.where(jnp.abs(c0) < eps, jnp.where(c0 < 0, -eps, eps), c0)

    def loss(ps):
        e = embed(ps, z_tr)
        sq = jnp.mean(jnp.sum((e - c[None, :]) ** 2, axis=1))
        l2 = sum(jnp.sum(w * w) for w in ps)
        return sq + weight_decay * l2

    params = _adam_train(loss, params, epochs, lr, dt)
    e_te = embed(params, z_te)
    return jnp.sum((e_te - c[None, :]) ** 2, axis=1)


@functools.lru_cache(maxsize=None)
def _dsvdd_scorer(
    hidden: tuple, epochs: int, lr: float, weight_decay: float, seed: int,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        dsvdd_scores_masked, hidden=hidden, epochs=epochs, lr=lr,
        weight_decay=weight_decay, seed=seed,
    )


@functools.lru_cache(maxsize=None)
def _ae_scorer(hidden: tuple, epochs: int, lr: float, seed: int):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        ae_scores_masked, hidden=hidden, epochs=epochs, lr=lr, seed=seed,
    )


@functools.lru_cache(maxsize=None)
def _mcd_scorer(
    support_fraction: float, n_starts: int, c_steps: int, seed: int,
):
    """Memoized partial (one hashable static per config; see
    :func:`_loda_scorer`)."""
    return functools.partial(
        mcd_scores_masked, support_fraction=support_fraction,
        n_starts=n_starts, c_steps=c_steps, seed=seed,
    )


def copod_dim_scores(x_test: jax.Array, x_train: jax.Array) -> jax.Array:
    """Per-dimension two-sided ECDF tail scores, COPOD-style.

    ``O[i, j] = max(-log F_left(x_ij), -log F_right(x_ij))`` with the
    empirical CDFs of the train column (smoothed to 1/n at the tails).
    Simplification vs pyod's COPOD: no skewness correction. The per-dim
    structure makes the whole subspace ensemble ONE matmul:
    ``scores = O @ masks.T`` — every mask's score is a masked sum.
    """
    n_tr = x_train.shape[0]
    sorted_cols = jnp.sort(x_train, axis=0)  # (ntr, d)

    def per_dim(col_sorted, queries):
        left = jnp.searchsorted(col_sorted, queries, side="right") / n_tr
        right = 1.0 - jnp.searchsorted(col_sorted, queries, side="left") / n_tr
        floor = 1.0 / n_tr
        return jnp.maximum(
            -jnp.log(jnp.maximum(left, floor)),
            -jnp.log(jnp.maximum(right, floor)),
        )

    return jax.vmap(per_dim, in_axes=(1, 1), out_axes=1)(sorted_cols, x_test)


def hbos_dim_scores(
    x_test: jax.Array, x_train: jax.Array, n_bins: int = 10
) -> jax.Array:
    """Per-dimension histogram tail scores, HBOS-style (pyod HBOS; the
    reference's pyod pin at requirements.txt:58 makes the histogram family
    part of the downstream-capability surface).

    ``O[i, j] = -log(density_j(bin(x_ij)) + eps)`` with equal-width
    histograms of the train column. Like COPOD, the per-dim structure makes
    the whole subspace ensemble ONE matmul ``O @ masks.T``.
    Test values OUTSIDE the train range get the floor density (maximal
    score ``-log(eps)``) rather than inheriting an edge bin's density —
    an extreme out-of-range outlier must not score like an edge inlier
    (round-2 advisor finding; pyod's HBOS likewise penalizes out-of-range
    points). Simplification vs pyod's HBOS (documented): no bin-width
    smoothing parameter (``alpha``/``tol``) is applied.
    """
    n_tr = x_train.shape[0]
    eps = 1e-12

    def per_dim(col, queries):
        lo, hi = jnp.min(col), jnp.max(col)
        width = jnp.maximum((hi - lo) / n_bins, eps)
        idx_tr = jnp.clip(((col - lo) / width).astype(jnp.int32), 0, n_bins - 1)
        counts = jnp.zeros((n_bins,), jnp.float32).at[idx_tr].add(1.0)
        density = counts / (n_tr * width)
        idx_te = jnp.clip(
            ((queries - lo) / width).astype(jnp.int32), 0, n_bins - 1
        )
        in_range = (queries >= lo) & (queries <= hi)
        return -jnp.log(jnp.where(in_range, density[idx_te], 0.0) + eps)

    return jax.vmap(per_dim, in_axes=(1, 1), out_axes=1)(x_train, x_test)


def ecod_dim_scores(x_test: jax.Array, x_train: jax.Array) -> jax.Array:
    """Per-dimension ECOD tail-score planes (Li et al. 2022; pyod 2.0's
    flagship detector — the reference's pyod pin at requirements.txt:58
    makes it part of the downstream-capability surface).

    Returns ``(nt, d, 3)`` stacked planes ``[U_left, U_right, U_auto]``
    with ``U_left = -log F_j(x)``, ``U_right = -log (1 - F_j(x^-))`` from
    the train column's empirical CDFs (tails floored at 1/n, as in
    :func:`copod_dim_scores`), and ``U_auto`` selecting the tail by the
    train column's skewness sign (left tail when left-skewed). The
    per-dim structure keeps the whole subspace ensemble three matmuls:
    each plane's masked sum is ``U_p @ masks.T`` and the final ECOD score
    is the elementwise max over the three plane sums — exactly the
    paper's ``O(x) = max(O_left, O_right, O_auto)`` restricted to the
    subspace's dims. Divergences vs pyod's ECOD (documented): pyod fits
    the ECDFs on the concatenated train+test batch (transductive) and
    takes the per-dimension max of the three tail scores before summing;
    this implementation is inductive (train-column ECDFs only, matching
    our COPOD) and follows the paper's max-of-sums form.
    """
    n_tr = x_train.shape[0]
    sorted_cols = jnp.sort(x_train, axis=0)  # (ntr, d)
    floor = 1.0 / n_tr

    def per_dim(col_sorted, queries):
        left = jnp.searchsorted(col_sorted, queries, side="right") / n_tr
        right = 1.0 - jnp.searchsorted(col_sorted, queries, side="left") / n_tr
        u_l = -jnp.log(jnp.maximum(left, floor))
        u_r = -jnp.log(jnp.maximum(right, floor))
        centered = col_sorted - jnp.mean(col_sorted)
        # standardize before cubing: only the SIGN is used, and raw cubes
        # overflow f32 for large-scale columns (|x| > ~1e12)
        c = centered / (jnp.std(col_sorted) + 1e-30)
        skew = jnp.mean(c**3)
        u_auto = jnp.where(skew < 0, u_l, u_r)
        return jnp.stack([u_l, u_r, u_auto], axis=-1)  # (nt, 3)

    return jax.vmap(per_dim, in_axes=(1, 1), out_axes=1)(sorted_cols, x_test)


def _iforest_adapter(x_test, x_train, mask, k):
    """SubspaceEnsemble scorer signature -> iforest (k = number of trees)."""
    from vgan_tpu.ensemble.iforest import iforest_scores_masked

    return iforest_scores_masked(x_test, x_train, mask, n_trees=k)


def _chunked_masks(subspaces, proba, chunk: int, n_shards: int = 1):
    """(n_chunks, chunk, d) masks + (n_chunks, chunk) proba, zero-padded so
    the subspace axis splits into whole chunks (and per-shard chunk groups).
    Padding rows carry proba == 0 — the aggregation contract every scorer
    path honors (weight 0 for 'average', -inf'd for 'max')."""
    masks_np = np.asarray(subspaces, dtype=bool)
    proba_np = np.asarray(proba, dtype=np.float32)
    pad = (-len(masks_np)) % (chunk * n_shards)
    if pad:
        masks_np = np.concatenate(
            [masks_np, np.zeros((pad, masks_np.shape[1]), bool)]
        )
        proba_np = np.concatenate([proba_np, np.zeros((pad,), np.float32)])
    n_chunks = masks_np.shape[0] // chunk
    return (
        masks_np.reshape(n_chunks, chunk, -1),
        proba_np.reshape(n_chunks, chunk),
    )


def random_subspaces(
    d: int, n_subspaces: int, seed: int = 0,
    min_dims: Optional[int] = None, max_dims: Optional[int] = None,
):
    """Feature-bagging mask pool: ``(masks (n, d) bool, uniform proba)``.

    The baseline the V-GAN paper (arXiv:2504.07522) compares its learned
    subspace distribution against — pyod's FeatureBagging convention
    (requirements.txt:58): each member draws a subspace size uniformly in
    ``[d//2, d-1]`` (overridable via ``min_dims``/``max_dims``) and then
    that many distinct feature indices. Feed the result to
    :class:`SubspaceEnsemble`/:class:`HeterogeneousEnsemble` exactly like
    a learned ``(model.subspaces, model.proba)`` pair to quantify what the
    LEARNED distribution adds over random bagging on your data.
    """
    if min_dims is None:
        min_dims = max(1, d // 2)
    if max_dims is None:
        max_dims = max(1, d - 1)
    if not 1 <= min_dims <= max_dims <= d:
        raise ValueError(
            f"need 1 <= min_dims <= max_dims <= d, got "
            f"min_dims={min_dims}, max_dims={max_dims}, d={d}"
        )
    rng = np.random.default_rng(seed)
    masks = np.zeros((n_subspaces, d), bool)
    sizes = rng.integers(min_dims, max_dims + 1, size=n_subspaces)
    for i, sz in enumerate(sizes):
        masks[i, rng.choice(d, size=sz, replace=False)] = True
    proba = np.full(n_subspaces, 1.0 / n_subspaces, np.float32)
    return masks, proba


def _proba_from_scores(
    train_scores: np.ndarray, test_scores: np.ndarray, method: str
) -> np.ndarray:
    """pyod ``predict_proba`` calibration: map raw outlier scores to (n, 2)
    probabilities using TRAIN-score statistics. 'linear' = min-max scaling
    by the train range; 'unify' = erf of the train-standardized score
    (Kriegel, Kroger, Schubert & Zimek 2011, as in pyod)."""
    import math

    tr = np.asarray(train_scores, np.float64)
    te = np.asarray(test_scores, np.float64)
    if method == "linear":
        lo, hi = tr.min(), tr.max()
        p = (te - lo) / max(hi - lo, 1e-12)
    elif method == "unify":
        mu, sd = tr.mean(), tr.std()
        z = (te - mu) / max(sd * math.sqrt(2.0), 1e-12)
        from scipy.special import erf

        p = erf(z)
    else:
        raise ValueError(
            f"unknown method={method!r}: expected 'linear' or 'unify'"
        )
    p = np.clip(p, 0.0, 1.0)
    return np.stack([1.0 - p, p], axis=1).astype(np.float32)


class PyodSurfaceMixin:
    """pyod ``BaseDetector`` post-fit surface, shared by
    :class:`SubspaceEnsemble` and
    :class:`~vgan_tpu.ensemble.hetero.HeterogeneousEnsemble` (one
    implementation — the classes must not silently diverge).

    Subclasses provide ``_train_matrix()`` (the fitted training data as
    numpy), ``decision_function``, ``contamination``, and the
    ``_decision_scores``/``_threshold`` slots.
    """

    def _train_matrix(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def decision_scores_(self) -> np.ndarray:
        """Training-set outlier scores (pyod ``BaseDetector`` attribute),
        computed lazily on first access and cached (reset by ``fit``);
        self-pairs excluded for the neighbor bases, pyod's unsupplied-X
        kneighbors semantics."""
        x_train = self._train_matrix()
        if self._decision_scores is None:
            self._decision_scores = self.decision_function(
                x_train, exclude_self=True
            )
        return self._decision_scores

    @property
    def labels_(self) -> np.ndarray:
        """0/1 training labels at the (1 - contamination) quantile of
        ``decision_scores_``. Computing this SETS ``threshold_`` to that
        quantile, preserving pyod's invariant
        ``labels_ == decision_scores_ > threshold_`` (a later ``predict``
        call overwrites ``threshold_`` with its documented per-call
        batch quantile)."""
        scores = self.decision_scores_
        self._threshold = float(
            np.quantile(scores, 1.0 - self.contamination)
        )
        return (scores > self._threshold).astype(np.int64)

    def _calibration_scores(self, x_test: np.ndarray):
        """(train_scores, test_scores) used by ``predict_proba``."""
        return self.decision_scores_, self.decision_function(
            np.asarray(x_test)
        )

    def predict_proba(
        self, x_test: np.ndarray, method: str = "linear"
    ) -> np.ndarray:
        """(n, 2) outlier probabilities, pyod ``BaseDetector`` semantics.

        'linear' min-max-scales test scores by the TRAIN score range;
        'unify' is Kriegel et al.'s unification: erf of the train-
        standardized score. Column 1 is P(outlier), column 0 its
        complement."""
        tr, te = self._calibration_scores(x_test)
        return _proba_from_scores(tr, te, method)


def _zscore(s):
    """Per-subspace standardization over the test axis (suod-style)."""
    mu = jnp.mean(s, axis=1, keepdims=True)
    sd = jnp.std(s, axis=1, keepdims=True) + 1e-12
    return (s - mu) / sd


def _bucket_aggregate(
    s: np.ndarray, proba: np.ndarray, aggregation: str, n_buckets: int,
    seed: int = 0,
):
    """AOM / MOA bucketed combination (the combo library's other two modes;
    reference pin at requirements.txt:6). Kept subspaces are SHUFFLED with
    a fixed seed before round-robin bucket assignment — deterministic, but
    matching combo's random-subgroup semantics (round-2 advisor finding:
    V-GAN mask samples cluster similar masks adjacently, so striping in
    storage order could systematically bias per-bucket maxima/averages).
    'aom' averages the per-bucket maxima, 'moa' takes the max of the
    per-bucket averages, 'median' is combo's median combination (no
    buckets). Probability-ignoring, like 'max' — except zero-probability
    masks, which are dropped (the invariant every aggregation path
    honors: proba == 0 rows never influence scores)."""
    keep = np.asarray(proba) > 0
    s = s[keep]
    if aggregation == "median":
        return np.median(s, axis=0)
    n = s.shape[0]
    s = s[np.random.default_rng(seed).permutation(n)]
    n_buckets = max(1, min(n_buckets, n))
    idx = np.arange(n) % n_buckets
    if aggregation == "aom":
        return np.mean(
            [s[idx == b].max(axis=0) for b in range(n_buckets)], axis=0
        )
    return np.max(
        [s[idx == b].mean(axis=0) for b in range(n_buckets)], axis=0
    )


_BASE_SCORERS = {
    "knn": knn_scores_masked,
    "knn_mean": mean_dist_scores_masked,
    "lof": lof_scores_masked,
    "abod": abod_scores_masked,
    "cof": cof_scores_masked,
    "iforest": _iforest_adapter,
    "mahalanobis": mahalanobis_scores_masked,
}

# Neighbor-based bases: exclude_self (positional self-pair drop) reaches
# exactly these — the single tuple the guard sites and hetero share.
# sod is parametric (dispatched in _scorer_and_k's param branch) but
# neighbor-semantic: its kNN lists obey the same k < n_train /
# exclude_self contract.
_NEIGHBOR_BASES = ("knn", "knn_mean", "lof", "abod", "cof", "sod")

# Bases for which exclude_self=True relies on positional test-row ==
# train-row alignment (so chunking must be bypassed and decision_scores_
# passes the flag): the k-neighbor bases plus sos, whose transductive
# formula drops the self column but has no k (the k < n_train guards
# stay on _NEIGHBOR_BASES).
_POSITIONAL_EXCL_BASES = _NEIGHBOR_BASES + ("sos", "lmdd")

# Dim-decomposable bases: per-dim score planes shared across ALL masks, the
# whole ensemble reduces to masked-sum matmuls (see _dim_subspace_raw).
_DIM_BASES = ("copod", "hbos", "ecod")

# Self-excluding variants for scoring the train set itself (pyod's
# unsupplied-X kneighbors semantics). Module-level singletons so the jitted
# paths see one hashable static per base. iforest is distribution-based —
# self-inclusion is inherent there (as in pyod's IForest).
_BASE_SCORERS_EXCL = {
    "knn": functools.partial(knn_scores_masked, exclude_self=True),
    "knn_mean": functools.partial(mean_dist_scores_masked, exclude_self=True),
    "lof": functools.partial(lof_scores_masked, exclude_self=True),
    "abod": functools.partial(abod_scores_masked, exclude_self=True),
    "cof": functools.partial(cof_scores_masked, exclude_self=True),
    "iforest": _iforest_adapter,
    "mahalanobis": mahalanobis_scores_masked,
}

# Bases whose scorer carries extra hyperparameters (resolved through a
# memoized partial so the jitted paths still see one hashable static).
_PARAM_BASES = (
    "loda", "kde", "cblof", "gmm", "inne", "pca", "sampling", "kpca",
    "mcd", "ae", "dsvdd", "sod", "ocsvm", "sos", "lmdd",
)


def _scorer_and_k(
    base: str, *, k: int, n_trees: int, n_projections: int, n_bins: int,
    projection_seed: int, kde_bandwidth: float = 1.0,
    n_clusters: int = 8, cluster_alpha: float = 0.9,
    cluster_beta: float = 5.0, kmeans_iter: int = 30, cluster_seed: int = 0,
    cluster_init: str = "rows", gmm_covariance: str = "diag",
    inne_psi: int = 8, pca_n_components: int = 0, pca_n_selected: int = 0,
    pca_standardize: bool = True, pca_weighted: bool = True,
    subset_size: int = 20, kpca_n_components: int = 0,
    kpca_gamma: float = 0.0, kpca_sampling: bool = False,
    support_fraction: float = 0.0, mcd_starts: int = 8,
    mcd_steps: int = 15, ae_hidden: tuple = (64, 32),
    ae_epochs: int = 50, ae_lr: float = 1e-3,
    sod_ref_set: int = 10, sod_alpha: float = 0.8,
    ocsvm_nu: float = 0.5, ocsvm_gamma: float = 0.0, ocsvm_iters: int = 300,
    sos_perplexity: float = 4.5, sos_iters: int = 64,
    lmdd_dis: str = "var",
    exclude_self: bool = False,
):
    """Resolve a base name to its (scorer, static-k) pair — the single
    dispatch point shared by the ensemble paths and the serving exporters.
    ``exclude_self`` reaches the neighbor bases only; distribution-based
    bases (iforest/mahalanobis/loda/kde/cblof) inherently include the
    point, as pyod's do."""
    if base == "loda":
        return _loda_scorer(n_projections, n_bins, projection_seed), 0
    if base == "inne":
        # inne reads n_trees as its ensemble size (pyod's n_estimators)
        # and projection_seed as its center-subsample seed
        return _inne_scorer(int(n_trees), int(inne_psi),
                            int(projection_seed)), 0
    if base == "pca":
        return _pca_scorer(
            int(pca_n_components), int(pca_n_selected),
            bool(pca_standardize), bool(pca_weighted),
        ), 0
    if base == "sampling":
        # sampling reads projection_seed as its subsample seed
        return _sampling_scorer(int(subset_size), int(projection_seed)), 0
    if base == "kpca":
        # kpca's optional fit subsample reuses subset_size +
        # projection_seed (pyod's sampling/subset_size/random_state)
        return _kpca_scorer(
            int(kpca_n_components), float(kpca_gamma), bool(kpca_sampling),
            int(subset_size), int(projection_seed),
        ), 0
    if base == "mcd":
        # mcd reads projection_seed as its start-permutation seed
        return _mcd_scorer(
            float(support_fraction), int(mcd_starts), int(mcd_steps),
            int(projection_seed),
        ), 0
    if base == "ae":
        # ae reads projection_seed as its weight-init seed
        return _ae_scorer(
            tuple(int(h) for h in ae_hidden), int(ae_epochs),
            float(ae_lr), int(projection_seed),
        ), 0
    if base == "dsvdd":
        # dsvdd shares the ae knobs (encoder widths / epochs / lr) and
        # projection_seed; weight decay is Ruff's 1e-5 default
        return _dsvdd_scorer(
            tuple(int(h) for h in ae_hidden), int(ae_epochs),
            float(ae_lr), 1e-5, int(projection_seed),
        ), 0
    if base == "sod":
        # sod is the one parametric NEIGHBOR base: the ensemble's k is
        # its n_neighbors and exclude_self reaches its query kNN list
        return _sod_scorer(
            int(sod_ref_set), float(sod_alpha), bool(exclude_self),
        ), k
    if base == "ocsvm":
        return _ocsvm_scorer(
            float(ocsvm_nu), float(ocsvm_gamma), int(ocsvm_iters),
        ), 0
    if base == "sos":
        # sos honors exclude_self (positional transductive scoring) but
        # has no k — it is positional-excl without the neighbor k guard
        return _sos_scorer(
            float(sos_perplexity), int(sos_iters), bool(exclude_self),
        ), 0
    if base == "lmdd":
        # lmdd honors exclude_self (leave-one-out vs add-one smoothing
        # factor) the same positional way
        return _lmdd_scorer(str(lmdd_dis), bool(exclude_self)), 0
    if base == "kde":
        return _kde_scorer(float(kde_bandwidth), False), 0
    if base == "cblof":
        return _cblof_scorer(
            int(n_clusters), float(cluster_alpha), float(cluster_beta),
            int(kmeans_iter), int(cluster_seed), str(cluster_init),
        ), 0
    if base == "gmm":
        # gmm reads the cluster knobs: n_clusters = mixture components,
        # kmeans_iter = EM iterations, cluster_seed = means init
        return _gmm_scorer(
            int(n_clusters), int(kmeans_iter), int(cluster_seed),
            str(cluster_init), str(gmm_covariance),
        ), 0
    scorers = _BASE_SCORERS_EXCL if exclude_self else _BASE_SCORERS
    return scorers[base], (n_trees if base == "iforest" else k)


def _scorer_params(ens) -> dict:
    """The base-scorer configuration an ensemble instance carries, as
    :func:`_scorer_and_k` kwargs — ONE extraction point shared by the live
    scoring paths and the serving exporters, so a new parametric base only
    touches the dispatch, never the call sites."""
    return dict(
        k=ens.k, n_trees=ens.n_trees, n_projections=ens.n_projections,
        n_bins=ens.n_bins, projection_seed=ens.projection_seed,
        kde_bandwidth=ens.kde_bandwidth, n_clusters=ens.n_clusters,
        cluster_alpha=ens.cluster_alpha, cluster_beta=ens.cluster_beta,
        kmeans_iter=ens.kmeans_iter, cluster_seed=ens.cluster_seed,
        cluster_init=ens.cluster_init, gmm_covariance=ens.gmm_covariance,
        inne_psi=ens.inne_psi, pca_n_components=ens.pca_n_components,
        pca_n_selected=ens.pca_n_selected,
        pca_standardize=ens.pca_standardize, pca_weighted=ens.pca_weighted,
        subset_size=ens.subset_size,
        kpca_n_components=ens.kpca_n_components,
        kpca_gamma=ens.kpca_gamma, kpca_sampling=ens.kpca_sampling,
        support_fraction=ens.support_fraction,
        mcd_starts=ens.mcd_starts, mcd_steps=ens.mcd_steps,
        ae_hidden=ens.ae_hidden, ae_epochs=ens.ae_epochs, ae_lr=ens.ae_lr,
        sod_ref_set=ens.sod_ref_set, sod_alpha=ens.sod_alpha,
        ocsvm_nu=ens.ocsvm_nu, ocsvm_gamma=ens.ocsvm_gamma,
        ocsvm_iters=ens.ocsvm_iters,
        sos_perplexity=ens.sos_perplexity, sos_iters=ens.sos_iters,
        lmdd_dis=ens.lmdd_dis,
    )


class SubspaceEnsemble(PyodSurfaceMixin):
    """Ensemble outlier detector over V-GAN subspaces.

    Parameters
    ----------
    subspaces, proba:
        Either pass explicit masks (n_subspaces, d) + probabilities, or a
        fitted ``VGAN``/``VGAN_no_kl`` via ``from_model``.
    base:
        'knn' (k-th NN distance), 'knn_mean', 'lof', 'abod' (negated
        angle-based outlier factor over the k nearest neighbors —
        FastABOD), 'cof' (connectivity-based outlier factor: the query's
        average chaining distance relative to its neighbors'), 'iforest',
        'mahalanobis' (per-subspace squared Mahalanobis distance — the
        PCA/MCD family), 'cblof' (cluster-based: distance to the nearest
        large k-means centroid), 'gmm' (negative diagonal-Gaussian-mixture
        log-likelihood; reads n_clusters/kmeans_iter/cluster_seed as its
        components/EM-iterations/init seed), 'loda' (random-projection
        histograms), 'inne' (isolation via nearest-neighbor hypersphere
        ensembles — reads n_trees/inne_psi/projection_seed), 'pca'
        (pyod's PCA detector: summed component-vector distances weighted
        by inverse explained-variance ratio — reads the pca_* knobs),
        'sampling' (distance to the nearest of ``subset_size`` sampled
        train rows — Sugiyama & Borgwardt 2013; reads
        ``projection_seed`` as its draw seed), 'kpca' (kernel-PCA
        reconstruction error in RBF feature space — Hoffmann 2007;
        reads the kpca_* knobs, and ``subset_size``/``projection_seed``
        when ``kpca_sampling=True``), 'mcd' (Minimum Covariance
        Determinant — squared Mahalanobis distance to sklearn
        MinCovDet's reweighted FastMCD estimates; reads
        ``support_fraction``/``mcd_starts``/``mcd_steps`` and
        ``projection_seed`` as its start seed), 'ae' (symmetric MLP
        autoencoder reconstruction distance, trained in-program per
        subspace — reads the ae_* knobs and ``projection_seed`` as its
        init seed), 'dsvdd' (Deep SVDD: squared distance of a bias-free
        MLP embedding to the frozen mean-init hypersphere center, Ruff
        et al. 2018 — shares the ae_* knobs), 'sod' (Kriegel 2009
        subspace outlier detection: deviation from the shared-nearest-
        neighbor reference set in its low-variance dimensions — reads
        ``k`` as its n_neighbors plus ``sod_ref_set``/``sod_alpha``),
        'ocsvm' (one-class SVM, Schölkopf 2001: the exact libsvm dual QP
        solved in-program by projected FISTA on the RBF kernel — reads
        the ocsvm_* knobs), 'sos' (Stochastic Outlier Selection,
        Janssens 2012: perplexity-calibrated affinity binding
        probabilities, score = the probability no other point binds to
        the query — reads sos_perplexity/sos_iters), 'kde' (negative
        Gaussian kernel-density log-likelihood), 'copod',
        'hbos', 'ecod', or a pyod-style detector instance (CPU fallback
        loop; pyod optional — any object with sklearn-style
        get_params/fit/decision_function).
    k:
        neighborhood size for the distance-based native detectors.
    n_trees:
        forest size for base='iforest'.
    aggregation:
        'average' (probability-weighted mean of per-subspace scores),
        'max' (probability-ignoring maximum) — the two pyod combination
        modes the reference experiments use — or the combo library's
        bucketed modes 'aom' (average of per-bucket maxima) / 'moa'
        (max of per-bucket averages; see ``n_buckets``) and 'median'
        (probability-ignoring per-point median over the kept subspaces);
        'weighted' (combo's weighted-average: explicit per-mask
        ``weights`` instead of the pool probabilities) and 'vote'
        (combo's majority_vote: each subspace member labels points at its
        own train-score contamination quantile over RAW scores —
        ``normalize`` is irrelevant there — and ``decision_function``
        returns the weighted vote fraction in [0, 1]; ``predict`` applies
        the strict majority, ties inliers).
    weights:
        per-mask combination weights (non-negative; zero-probability
        masks still drop, then the rest renormalize). REQUIRED for
        'weighted'; optional for 'vote' (pool probabilities by default);
        ignored by the other aggregations.
    normalize:
        'zscore' standardizes each subspace's scores before aggregation
        (suod-style), None aggregates raw scores.
    n_buckets:
        bucket count for 'aom'/'moa' (combo's default 5).
    n_bins:
        histogram resolution for base='hbos'.
    bucket_seed:
        seed for the deterministic shuffle that assigns subspaces to
        'aom'/'moa' buckets (decorrelates adjacent masks).
    n_projections, projection_seed:
        random-direction count and seed for base='loda' (the projection
        matrix is shared across all subspaces, masked per subspace;
        'loda' also uses ``n_bins`` for its histogram resolution).
    kde_bandwidth:
        Gaussian kernel width for base='kde' (sklearn KernelDensity's
        default 1.0).
    inne_psi:
        hypersphere-center subsample size for base='inne' (pyod INNE's
        max_samples; its 'auto' = min(8, n_train) — psi clamps to
        n_train the same way). 'inne' reads ``n_trees`` as its ensemble
        size and ``projection_seed`` as its subsample seed.
    pca_n_components, pca_n_selected, pca_standardize, pca_weighted:
        base='pca' knobs mirroring pyod's PCA(n_components,
        n_selected_components, standardization, weighted); the two counts
        use 0 for pyod's None (all valid components), and
        ``pca_n_selected`` takes components from the SMALLEST-variance
        end of the kept list, as pyod does.
    subset_size:
        base='sampling' subsample size (pyod Sampling's subset_size;
        clamps to n_train); also base='kpca''s fit-subsample size when
        ``kpca_sampling=True``.
    kpca_n_components, kpca_gamma, kpca_sampling:
        base='kpca' knobs mirroring pyod's KPCA(n_components, gamma,
        sampling): 0 components = all valid (pyod's None), gamma 0.0 =
        pyod's None (``1 / popcount(mask)`` per subspace — the RBF width
        sklearn would derive on the projected data), and
        ``kpca_sampling=True`` fits the kernel spectrum on a
        ``subset_size`` host-drawn train subsample (pyod's own O(n^2)
        escape hatch).
    support_fraction, mcd_starts, mcd_steps:
        base='mcd' knobs: ``support_fraction`` mirrors sklearn
        MinCovDet's (0.0 = None: ``h = ceil((n + p + 1)/2)`` with p the
        per-subspace active dim count); ``mcd_starts`` random starts
        each run ``mcd_steps`` c-steps (fixed-protocol FastMCD — the
        documented divergence vs sklearn's adaptive tournament).
    ae_hidden, ae_epochs, ae_lr:
        base='ae' knobs mirroring pyod AutoEncoder's
        hidden_neuron_list/epoch_num/lr: encoder widths (decoder
        mirrored), full-batch Adam steps, learning rate. Every mask
        trains its OWN autoencoder inside the one compiled program
        (vmap over masks batches the training matmuls). base='dsvdd'
        reads the same three knobs (its encoder = ``ae_hidden``, no
        decoder, no biases).
    sod_ref_set, sod_alpha:
        base='sod' knobs mirroring pyod SOD's ref_set/alpha: the
        shared-nearest-neighbor reference-set size and the variance
        threshold coefficient (a dim is relevant when its reference
        variance < alpha * mean variance). ``k`` is SOD's n_neighbors.
    ocsvm_nu, ocsvm_gamma, ocsvm_iters:
        base='ocsvm' knobs mirroring sklearn OneClassSVM's nu/gamma
        (ocsvm_gamma=0.0 = pyod's 'auto': 1/n_active_features per
        subspace) plus the fixed FISTA iteration budget of the
        in-program dual-QP solver (300 reproduces libsvm's decision
        values to ~2e-4 relative; see ``ocsvm_scores_masked``).
    sos_perplexity, sos_iters:
        base='sos' knobs: the target binding-distribution perplexity
        (paper default 4.5; must be < n_train) and the fixed
        beta-bisection budget (see ``sos_scores_masked``).
    lmdd_dis:
        base='lmdd' dissimilarity measure: 'var' (mean per-dim
        variance) or 'aad' (mean absolute deviation; see
        ``lmdd_scores_masked``).
    test_chunk:
        score ``decision_function`` test sets larger than this in
        ``test_chunk``-row slices — n_test becomes unbounded at
        O(n_subspaces x test_chunk) device memory. Exact (global zscore
        moments via a float64 accumulation pass); ``exclude_self`` calls
        (``predict``'s combined batch) bypass chunking since they rely
        on positional alignment. None (default) scores in one shot.
    contamination:
        expected outlier fraction; sets the ``predict`` threshold at the
        (1 - contamination) quantile of the train scores (pyod semantics).
    jl_dim, jl_seed:
        optional Johnson-Lindenstrauss random projection (suod's
        per-detector dimensionality-reduction stage,
        /root/reference/requirements.txt:68): ``fit`` draws a seeded
        Gaussian (d, jl_dim) matrix and the member works entirely in the
        projected space — ``subspaces`` must then have ``jl_dim`` columns
        (a full-projected-space member passes ``np.ones((1, jl_dim))``),
        and every scoring entry point projects original-d inputs
        in-graph (one MXU matmul; the serving export embeds it).
    chunk:
        subspace-axis chunk size bounding the (chunk, nt, ntr) distance
        block in memory.
    mesh:
        optional ``jax.sharding.Mesh`` with a 'data' axis: the mask-chunk
        axis (embarrassingly parallel) shards over it via ``shard_map``,
        each device scoring its local subspaces and the aggregation
        combining with a single ``psum``/``pmax`` (SURVEY.md section 2b,
        ensemble/subspace parallel axis). The dim-decomposable bases
        (copod/hbos/ecod) ignore ``mesh`` — their whole ensemble is a few
        matmuls on shared (nt, d) score planes, cheaper single-device than
        any sharding at realistic sizes.

    Behavioral divergence from pyod (flagged): ``predict`` recomputes
    ``threshold_`` on EVERY call from the combined train+test batch, and
    with ``normalize='zscore'`` the per-subspace statistics are computed
    over that batch — so the same test point can flip labels across calls
    with different batch compositions. pyod instead fixes ``threshold_``
    once at fit time. The one-batch design is deliberate (shared zscore
    statistics keep the train-derived threshold comparable to the test
    scores); pyod-compatible consumers needing a frozen threshold should
    use ``normalize=None`` and cache ``threshold_`` after one ``predict``
    call on a reference batch.
    """

    def __init__(
        self,
        subspaces: np.ndarray,
        proba: np.ndarray,
        base="knn",
        k: int = 10,
        aggregation: str = "average",
        weights: Optional[np.ndarray] = None,
        normalize: Optional[str] = "zscore",
        chunk: int = 128,
        mesh: Optional[Mesh] = None,
        n_trees: int = 100,
        n_buckets: int = 5,
        n_bins: int = 10,
        contamination: float = 0.1,
        bucket_seed: int = 0,
        n_projections: int = 100,
        projection_seed: int = 0,
        kde_bandwidth: float = 1.0,
        n_clusters: int = 8,
        cluster_alpha: float = 0.9,
        cluster_beta: float = 5.0,
        kmeans_iter: int = 30,
        cluster_seed: int = 0,
        cluster_init: str = "rows",
        gmm_covariance: str = "diag",
        inne_psi: int = 8,
        pca_n_components: int = 0,
        pca_n_selected: int = 0,
        pca_standardize: bool = True,
        pca_weighted: bool = True,
        subset_size: int = 20,
        kpca_n_components: int = 0,
        kpca_gamma: float = 0.0,
        kpca_sampling: bool = False,
        support_fraction: float = 0.0,
        mcd_starts: int = 8,
        mcd_steps: int = 15,
        ae_hidden: tuple = (64, 32),
        ae_epochs: int = 50,
        ae_lr: float = 1e-3,
        sod_ref_set: int = 10,
        sod_alpha: float = 0.8,
        ocsvm_nu: float = 0.5,
        ocsvm_gamma: float = 0.0,
        ocsvm_iters: int = 300,
        sos_perplexity: float = 4.5,
        sos_iters: int = 64,
        lmdd_dis: str = "var",
        test_chunk: Optional[int] = None,
        jl_dim: Optional[int] = None,
        jl_seed: int = 0,
    ):
        if aggregation not in (
            "average", "max", "aom", "moa", "median", "weighted", "vote",
        ):
            raise ValueError(
                f"unknown aggregation={aggregation!r}: expected 'average', "
                "'max', 'aom', 'moa', 'median', 'weighted', or 'vote'"
            )
        if aggregation == "weighted" and weights is None:
            raise ValueError(
                "aggregation='weighted' needs explicit weights= (combo's "
                "weighted-average combinator); 'average' already weights "
                "by the pool probabilities"
            )
        if normalize not in (None, "zscore"):
            raise ValueError(
                f"unknown normalize={normalize!r}: expected 'zscore' or None"
            )
        if not kde_bandwidth > 0:
            raise ValueError(
                f"kde_bandwidth must be positive; got {kde_bandwidth!r} "
                "(sklearn KernelDensity convention)"
            )
        if not 0.0 < cluster_alpha <= 1.0:
            raise ValueError(
                f"cluster_alpha must be in (0, 1]; got {cluster_alpha!r} "
                "(fraction of train rows the large clusters must cover)"
            )
        if not cluster_beta >= 1.0:
            raise ValueError(
                f"cluster_beta must be >= 1; got {cluster_beta!r} (size "
                "ratio across the large/small boundary)"
            )
        if base == "cblof" and n_clusters < 2:
            raise ValueError(
                f"cblof needs n_clusters >= 2; got {n_clusters}"
            )
        if base == "gmm" and n_clusters < 1:
            raise ValueError(
                f"gmm needs n_clusters >= 1 (mixture components); "
                f"got {n_clusters}"
            )
        if cluster_init not in ("rows", "kmeans++"):
            raise ValueError(
                f"unknown cluster_init={cluster_init!r}: expected 'rows' "
                "or 'kmeans++'"
            )
        if gmm_covariance not in ("diag", "full"):
            raise ValueError(
                f"unknown gmm_covariance={gmm_covariance!r}: expected "
                "'diag' or 'full'"
            )
        if not (isinstance(inne_psi, (int, np.integer))
                and not isinstance(inne_psi, bool) and inne_psi >= 2):
            raise ValueError(
                f"inne_psi must be an int >= 2 (hypersphere-center "
                f"subsample size); got {inne_psi!r}"
            )
        if not (isinstance(subset_size, (int, np.integer))
                and not isinstance(subset_size, bool) and subset_size >= 1):
            raise ValueError(
                f"subset_size must be an int >= 1 (base='sampling' "
                f"subsample size); got {subset_size!r}"
            )
        if not (isinstance(support_fraction, (int, float, np.floating))
                and not isinstance(support_fraction, bool)
                and 0.0 <= support_fraction <= 1.0):
            raise ValueError(
                f"support_fraction must be in [0, 1] (0 = sklearn's None: "
                f"h = ceil((n + p + 1)/2) per subspace); got "
                f"{support_fraction!r}"
            )
        for name, val in (("mcd_starts", mcd_starts),
                          ("mcd_steps", mcd_steps)):
            if not (isinstance(val, (int, np.integer))
                    and not isinstance(val, bool) and val >= 1):
                raise ValueError(
                    f"{name} must be an int >= 1; got {val!r}"
                )
        if not (isinstance(sod_ref_set, (int, np.integer))
                and not isinstance(sod_ref_set, bool) and sod_ref_set >= 1):
            raise ValueError(
                f"sod_ref_set must be an int >= 1 (pyod SOD's reference-"
                f"set size); got {sod_ref_set!r}"
            )
        if not (isinstance(sod_alpha, (int, float, np.floating))
                and not isinstance(sod_alpha, bool) and sod_alpha > 0.0):
            raise ValueError(
                f"sod_alpha must be a float > 0 (variance-threshold "
                f"coefficient); got {sod_alpha!r}"
            )
        if not (isinstance(ocsvm_nu, (int, float, np.floating))
                and not isinstance(ocsvm_nu, bool)
                and 0.0 < ocsvm_nu <= 1.0):
            raise ValueError(
                f"ocsvm_nu must be in (0, 1] (Schölkopf's outlier-"
                f"fraction bound); got {ocsvm_nu!r}"
            )
        if not (isinstance(ocsvm_gamma, (int, float, np.floating))
                and not isinstance(ocsvm_gamma, bool) and ocsvm_gamma >= 0.0):
            raise ValueError(
                f"ocsvm_gamma must be >= 0 (0 = pyod's 'auto': "
                f"1/n_active_features per subspace); got {ocsvm_gamma!r}"
            )
        if not (isinstance(ocsvm_iters, (int, np.integer))
                and not isinstance(ocsvm_iters, bool) and ocsvm_iters >= 1):
            raise ValueError(
                f"ocsvm_iters must be an int >= 1 (FISTA iteration "
                f"budget); got {ocsvm_iters!r}"
            )
        if not (isinstance(sos_perplexity, (int, float, np.floating))
                and not isinstance(sos_perplexity, bool)
                and sos_perplexity > 0.0):
            raise ValueError(
                f"sos_perplexity must be a float > 0 (target binding-"
                f"distribution perplexity, paper default 4.5); got "
                f"{sos_perplexity!r}"
            )
        if not (isinstance(sos_iters, (int, np.integer))
                and not isinstance(sos_iters, bool) and sos_iters >= 1):
            raise ValueError(
                f"sos_iters must be an int >= 1 (beta-bisection budget); "
                f"got {sos_iters!r}"
            )
        if lmdd_dis not in ("var", "aad"):
            raise ValueError(
                f"unknown lmdd_dis={lmdd_dis!r}: expected 'var' or 'aad' "
                "(the leave-one-out-computable Arning dissimilarities)"
            )
        if not (len(tuple(ae_hidden)) >= 1 and all(
                isinstance(h, (int, np.integer)) and not isinstance(h, bool)
                and h >= 1 for h in tuple(ae_hidden))):
            raise ValueError(
                f"ae_hidden must be a non-empty tuple of ints >= 1 "
                f"(encoder widths, mirrored for the decoder); got "
                f"{ae_hidden!r}"
            )
        for name, val in (("ae_epochs", ae_epochs),):
            if not (isinstance(val, (int, np.integer))
                    and not isinstance(val, bool) and val >= 1):
                raise ValueError(f"{name} must be an int >= 1; got {val!r}")
        if not (isinstance(ae_lr, (int, float, np.floating))
                and not isinstance(ae_lr, bool) and ae_lr > 0.0):
            raise ValueError(
                f"ae_lr must be a float > 0; got {ae_lr!r}"
            )
        if not (isinstance(kpca_n_components, (int, np.integer))
                and not isinstance(kpca_n_components, bool)
                and kpca_n_components >= 0):
            raise ValueError(
                f"kpca_n_components must be an int >= 0 (0 = all valid "
                f"components, pyod's None); got {kpca_n_components!r}"
            )
        if not (isinstance(kpca_gamma, (int, float, np.floating))
                and not isinstance(kpca_gamma, bool) and kpca_gamma >= 0.0):
            raise ValueError(
                f"kpca_gamma must be a float >= 0 (0 = pyod's None: "
                f"1/n_active_features per subspace); got {kpca_gamma!r}"
            )
        for name, val in (("pca_n_components", pca_n_components),
                          ("pca_n_selected", pca_n_selected)):
            if not (isinstance(val, (int, np.integer))
                    and not isinstance(val, bool) and val >= 0):
                raise ValueError(
                    f"{name} must be an int >= 0 (0 = all valid "
                    f"components, pyod's None); got {val!r}"
                )
        if test_chunk is not None and (
            not isinstance(test_chunk, (int, np.integer))
            or isinstance(test_chunk, bool)
            or test_chunk < 1
        ):
            raise ValueError(
                f"test_chunk must be a positive int or None; got {test_chunk!r}"
            )
        if isinstance(base, str) and base not in (
            *_BASE_SCORERS, *_DIM_BASES, *_PARAM_BASES,
        ):
            raise ValueError(
                f"unknown base={base!r}: expected one of "
                f"{sorted(_BASE_SCORERS)} + {sorted(_DIM_BASES)} + "
                f"{sorted(_PARAM_BASES)} or a pyod-style detector instance"
            )
        if jl_dim is not None:
            if not (isinstance(jl_dim, (int, np.integer)) and jl_dim >= 1):
                raise ValueError(
                    f"jl_dim must be a positive int or None; got {jl_dim!r}"
                )
            if np.asarray(subspaces).shape[1] != jl_dim:
                raise ValueError(
                    f"with jl_dim={jl_dim} the subspace masks live in the "
                    f"PROJECTED space and must have {jl_dim} columns; got "
                    f"{np.asarray(subspaces).shape[1]} (suod's JL stage "
                    "projects the data each detector sees — a full-"
                    "projected-space member passes np.ones((1, jl_dim)))"
                )
        self.jl_dim = jl_dim
        self.jl_seed = int(jl_seed)
        self._jl_R = None
        self.subspaces = np.asarray(subspaces, dtype=bool)
        proba = np.asarray(proba, dtype=np.float32)
        if len(proba) != len(self.subspaces):
            raise ValueError(
                f"subspaces and proba disagree: {len(self.subspaces)} masks "
                f"vs {len(proba)} probabilities (a mismatched pool would be "
                "silently mis-weighted after chunk padding)"
            )
        self.proba = proba / proba.sum()
        if weights is not None:
            weights = np.asarray(weights, np.float32)
            if len(weights) != len(self.subspaces):
                raise ValueError(
                    f"weights and subspaces disagree: {len(weights)} weights "
                    f"vs {len(self.subspaces)} masks"
                )
            if np.any(weights < 0) or not (
                float((weights * (self.proba > 0)).sum()) > 0
            ):
                raise ValueError(
                    "weights must be non-negative with a positive sum over "
                    "the proba > 0 masks (zero-probability masks are always "
                    "dropped before combining)"
                )
        self.weights = weights
        self.base = base
        self.k = k
        self.aggregation = aggregation
        self.normalize = normalize
        self.chunk = chunk
        self.mesh = mesh
        self.n_trees = n_trees
        self.n_buckets = n_buckets
        self.n_bins = n_bins
        self.contamination = contamination
        self.bucket_seed = bucket_seed
        self.n_projections = n_projections
        self.projection_seed = projection_seed
        self.kde_bandwidth = kde_bandwidth
        self.n_clusters = n_clusters
        self.cluster_alpha = cluster_alpha
        self.cluster_beta = cluster_beta
        self.kmeans_iter = kmeans_iter
        self.cluster_seed = cluster_seed
        self.cluster_init = cluster_init
        self.gmm_covariance = gmm_covariance
        self.inne_psi = inne_psi
        self.pca_n_components = pca_n_components
        self.pca_n_selected = pca_n_selected
        self.pca_standardize = pca_standardize
        self.pca_weighted = pca_weighted
        self.subset_size = subset_size
        self.kpca_n_components = kpca_n_components
        self.kpca_gamma = kpca_gamma
        self.kpca_sampling = kpca_sampling
        self.support_fraction = support_fraction
        self.mcd_starts = mcd_starts
        self.mcd_steps = mcd_steps
        self.ae_hidden = tuple(ae_hidden)
        self.ae_epochs = ae_epochs
        self.ae_lr = ae_lr
        self.sod_ref_set = sod_ref_set
        self.sod_alpha = sod_alpha
        self.ocsvm_nu = ocsvm_nu
        self.ocsvm_gamma = ocsvm_gamma
        self.ocsvm_iters = ocsvm_iters
        self.sos_perplexity = sos_perplexity
        self.sos_iters = sos_iters
        self.lmdd_dis = lmdd_dis
        self.test_chunk = test_chunk
        self._x_train = None
        self._threshold = None
        self._decision_scores = None
        self._pool_dev = None
        self._vote_thr = None

    @classmethod
    def from_model(cls, model, subspace_count: int = 500, **kwargs):
        """Build from a fitted estimator via ``approx_subspace_dist``."""
        model.approx_subspace_dist(subspace_count)
        return cls(model.subspaces, model.proba, **kwargs)

    def fit(self, x_train: np.ndarray):
        x_train = np.asarray(x_train)
        if self.jl_dim is not None:
            d = x_train.shape[1]
            if not self.jl_dim < d:
                raise ValueError(
                    f"jl_dim={self.jl_dim} must be < the input dimension "
                    f"{d} (JL projection reduces; equal or larger is a "
                    "no-op that breaks the projected/original shape "
                    "dispatch)"
                )
            # Gaussian JL matrix, seeded — suod's per-detector random
            # projection stage (requirements.txt:68). One (d, m) constant;
            # train/test projections are single MXU matmuls.
            rng = np.random.default_rng(self.jl_seed)
            self._jl_R = jnp.asarray(
                rng.normal(0.0, 1.0 / np.sqrt(self.jl_dim),
                           size=(d, self.jl_dim)),
                jnp.float32,
            )
        self._x_train = jnp.asarray(
            self._project(x_train), dtype=jnp.float32
        )
        self._threshold = None
        self._decision_scores = None
        self._vote_thr = None
        return self

    def _project(self, x):
        """JL-project ``x`` into the member's working space (suod's
        per-detector random-projection stage). Shape-dispatched so every
        internal path is projection-idempotent: original-d inputs project,
        already-projected (jl_dim-column) inputs pass through — the two
        widths cannot collide because fit enforces jl_dim < d. numpy in ->
        numpy out (the host aggregation paths), jnp in -> jnp out."""
        if self._jl_R is None:
            return x
        d, m = self._jl_R.shape
        if x.shape[1] == m:
            return x
        if x.shape[1] != d:
            raise ValueError(
                f"input has {x.shape[1]} features; this JL member was fit "
                f"on {d} (projects to {m})"
            )
        if isinstance(x, np.ndarray):
            return np.asarray(
                jnp.asarray(x, jnp.float32) @ self._jl_R
            )
        return jnp.asarray(x, jnp.float32) @ self._jl_R

    def _combining_weights(self) -> np.ndarray:
        """Per-mask combination weights for the weighted-sum aggregations:
        ``proba`` for 'average'/'vote' (or the user ``weights`` when given
        for 'vote'), the user ``weights`` for 'weighted' (combo's
        weighted-average). Zero-probability masks always drop (the
        invariant every aggregation path honors), then renormalize."""
        if self.weights is None or self.aggregation not in (
            "weighted", "vote",
        ):
            return self.proba
        w = self.weights * (self.proba > 0)
        return (w / w.sum()).astype(np.float32)

    @property
    def _reduce_aggregation(self) -> str:
        """The aggregation name the compiled reduce programs see:
        'weighted' is 'average' over :meth:`_combining_weights`."""
        return (
            "average" if self.aggregation == "weighted" else self.aggregation
        )

    def _device_pool(self):
        """Device-resident (masks_f32, combining-weights) pair, uploaded
        once per instance — repeated ``decision_function`` calls must not
        pay a host->device pool transfer per call (VERDICT round-3
        item 3)."""
        if self._pool_dev is None:
            self._pool_dev = (
                jnp.asarray(self.subspaces, jnp.float32),
                jnp.asarray(self._combining_weights(), jnp.float32),
            )
        return self._pool_dev

    def _vote_thresholds(self) -> np.ndarray:
        """Per-subspace decision thresholds for aggregation='vote': the
        (1 - contamination) quantile of each subspace member's RAW scores
        on the TRAIN set (each member is its own pyod-style detector;
        combo's majority_vote then combines their labels). Raw scores —
        a member's quantile threshold is scale-free, and cross-batch
        zscore statistics would make train-derived thresholds
        incomparable to test scores. Computed once per fit, cached."""
        if self._vote_thr is None:
            x_tr = np.asarray(self._x_train)
            excl = isinstance(self.base, str) and (
                self.base in _POSITIONAL_EXCL_BASES
            )
            if isinstance(self.base, str) and self.base in _NEIGHBOR_BASES:
                assert self.k < len(x_tr), (
                    "vote thresholds need k < n_train (self-pairs are "
                    "excluded when scoring the train rows)"
                )
            s_tr = self._raw_per_subspace(x_tr, exclude_self=excl)
            self._vote_thr = np.quantile(
                s_tr, 1.0 - self.contamination, axis=1
            )
        return self._vote_thr

    def _vote_scores(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """Weighted fraction of subspace members voting 'outlier' (combo's
        majority-vote combinator lifted to a [0, 1] score; ``predict``
        applies the strict majority). Honors ``test_chunk`` (thresholds
        are train-derived constants, so slicing the test axis is exact);
        ``exclude_self`` calls bypass chunking as elsewhere (positional
        alignment)."""
        thr = self._vote_thresholds()
        w = self._combining_weights().astype(np.float64)
        x_test = np.asarray(x_test, np.float32)
        tc = self.test_chunk if (
            self.test_chunk is not None and not exclude_self
        ) else len(x_test)
        out = []
        for i in range(0, len(x_test), max(tc, 1)):
            s = self._raw_per_subspace(
                x_test[i:i + tc], exclude_self=exclude_self
            )
            out.append(w @ (s > thr[:, None]))
        return np.concatenate(out).astype(np.float32)

    def _train_matrix(self) -> np.ndarray:
        assert self._x_train is not None, "call fit(X_train) first"
        return np.asarray(self._x_train)

    def decision_function(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """Aggregated outlier scores (higher = more outlying).

        ``exclude_self`` drops (i, i) distance pairs for the neighbor-based
        bases (knn/knn_mean/lof/abod) — set it when the leading rows of
        ``x_test`` ARE the training rows (pyod's unsupplied-X kneighbors
        semantics; ``predict`` uses this for its train-score threshold).
        Distribution-based bases (iforest/mahalanobis/loda/kde/copod/
        hbos/ecod/pyod instances) inherently include the point, as in
        pyod."""
        assert self._x_train is not None, "call fit(X_train) first"
        x_test = self._project(np.asarray(x_test))
        neighbor_excl = exclude_self and isinstance(self.base, str) and (
            self.base in _POSITIONAL_EXCL_BASES
        )
        if neighbor_excl and self.base in _NEIGHBOR_BASES:
            # loud guard instead of sentinel-valued "distances": with
            # self-pairs dropped only n_train - 1 neighbors exist (sos is
            # positional-excl but has no k)
            assert self.k < self._x_train.shape[0], (
                "exclude_self=True needs k < n_train (self-pairs are "
                "excluded, so only n_train - 1 neighbors remain)"
            )
        if self.aggregation == "vote":
            return self._vote_scores(x_test, exclude_self=exclude_self)
        if (
            self.test_chunk is not None
            and not neighbor_excl
            and len(np.asarray(x_test)) > self.test_chunk
        ):
            # exclude_self relies on positional (test row i == train row i)
            # alignment, which slicing would break — but it only reaches
            # the neighbor bases, so only THOSE bypass chunking (predict's
            # combined batch); for every other base an exclude_self=True
            # call (e.g. the decision_scores_ mixin) is a no-op and must
            # still honor the memory bound
            return self._test_chunked_scores(x_test)
        if self.aggregation in ("aom", "moa", "median"):
            s = self.per_subspace_scores(x_test, exclude_self=exclude_self)
            return _bucket_aggregate(
                s, self.proba, self.aggregation, self.n_buckets,
                seed=self.bucket_seed,
            )
        if not isinstance(self.base, str):
            return self._pyod_decision_function(x_test)
        if self.base in _DIM_BASES:
            return self._dim_decision_function(x_test)

        x_test = jnp.asarray(np.asarray(x_test), dtype=jnp.float32)

        if self.base in ("knn", "knn_mean"):
            fast = self._knn_fused_decision_function(
                x_test, exclude_self=exclude_self
            )
            if fast is not None:
                return fast

        return np.asarray(
            self._native_scores(x_test, exclude_self, reduce=True)
        )

    def _native_scores(
        self, x_test: jax.Array, exclude_self: bool, reduce: bool
    ):
        """One dispatcher for the chunked native-scorer paths (shared by
        ``decision_function`` and ``per_subspace_scores`` so the scorer
        selection, mask chunking, and mesh placement exist once).

        ``reduce=True`` applies the 'average'/'max' aggregation inside the
        compiled program; ``reduce=False`` returns the raw
        (n_chunks, chunk, nt) score blocks (padding rows included).
        """
        scorer, k = _scorer_and_k(
            self.base, exclude_self=exclude_self, **_scorer_params(self),
        )
        n_shards = self.mesh.shape["data"] if self.mesh is not None else 1
        chunk = _effective_chunk(
            self.base, self.chunk, x_test.shape[0],
            self._x_train.shape[0], self._x_train.shape[1], k=self.k,
            n_clusters=self.n_clusters,
            gmm_covariance=self.gmm_covariance,
            n_trees=self.n_trees, inne_psi=self.inne_psi,
            kpca_sampling=self.kpca_sampling, subset_size=self.subset_size,
            mcd_starts=self.mcd_starts, ae_hidden=self.ae_hidden,
            sod_ref_set=self.sod_ref_set,
        )
        masks_np, proba_np = _chunked_masks(
            self.subspaces, self._combining_weights(), chunk, n_shards
        )

        if self.mesh is None:
            if reduce:
                return _ensemble_scores(
                    x_test, self._x_train,
                    jnp.asarray(masks_np), jnp.asarray(proba_np),
                    scorer=scorer, k=k,
                    aggregation=self._reduce_aggregation,
                    normalize=self.normalize,
                )
            return _per_subspace_chunked(
                x_test, self._x_train, jnp.asarray(masks_np),
                scorer=scorer, k=k,
            )

        repl = NamedSharding(self.mesh, PartitionSpec())
        x_r = jax.device_put(x_test, repl)
        tr_r = jax.device_put(self._x_train, repl)
        masks_sh = jax.device_put(
            masks_np, NamedSharding(self.mesh, PartitionSpec("data", None, None))
        )
        if reduce:
            proba_sh = jax.device_put(
                proba_np, NamedSharding(self.mesh, PartitionSpec("data", None))
            )
            fn = _sharded_ensemble_fn(
                self.mesh, scorer, k, self._reduce_aggregation,
                self.normalize,
            )
            return fn(x_r, tr_r, masks_sh, proba_sh)
        return _sharded_per_subspace_fn(self.mesh, scorer, k)(
            x_r, tr_r, masks_sh
        )

    def _knn_fused_decision_function(
        self, x_test, force: bool = False, exclude_self: bool = False
    ):
        """TPU fast path: the fused projection+KNN-score Pallas kernel
        (ops/pallas/knn_score.py, SURVEY.md section 2c C15) — the masked
        distance block never leaves VMEM. Covers ``exclude_self`` (in-kernel
        positional diagonal drop, so ``predict`` rides it too) and ``mesh``
        (mask shards scored locally with the fused kernel, one psum/pmax).
        Returns None when not applicable (CPU, unsupported shapes);
        ``force`` runs it in interpreter mode for equivalence tests."""
        import jax as _jax

        from vgan_tpu.ops.pallas.knn_score import knn_kernel_supported

        on_tpu = _jax.default_backend() in ("tpu", "axon")
        if not (on_tpu or force):
            return None
        nt, d = x_test.shape
        ntr = self._x_train.shape[0]
        if not knn_kernel_supported(nt, ntr, d, self.k):
            return None
        if exclude_self and self.k >= ntr:
            return None  # generic path / caller guard reports this loudly
        mode = "mean" if self.base == "knn_mean" else "kth"

        if self.mesh is not None:
            n_dev = self.mesh.shape["data"]
            masks_np = np.asarray(self.subspaces, np.float32)
            proba_np = np.asarray(self._combining_weights(), np.float32)
            pad = (-masks_np.shape[0]) % n_dev
            if pad:
                masks_np = np.concatenate(
                    [masks_np, np.zeros((pad, masks_np.shape[1]), np.float32)]
                )
                proba_np = np.concatenate(
                    [proba_np, np.zeros(pad, np.float32)]
                )
            fn = _sharded_fused_knn_fn(
                self.mesh, int(self.k), mode, bool(exclude_self),
                self._reduce_aggregation, self.normalize,
            )
            repl = NamedSharding(self.mesh, PartitionSpec())
            out = fn(
                jax.device_put(x_test, repl),
                jax.device_put(self._x_train, repl),
                jax.device_put(
                    jnp.asarray(masks_np),
                    NamedSharding(self.mesh, PartitionSpec("data", None)),
                ),
                jax.device_put(
                    jnp.asarray(proba_np),
                    NamedSharding(self.mesh, PartitionSpec("data")),
                ),
            )
            return np.asarray(out)

        masks_dev, proba_dev = self._device_pool()
        return np.asarray(_fused_knn_ensemble_scores(
            x_test, self._x_train, masks_dev, proba_dev,
            k=int(self.k), mode=mode, exclude_self=bool(exclude_self),
            aggregation=self._reduce_aggregation, normalize=self.normalize,
            interpret=not on_tpu,
        ))

    def predict(self, x_test: np.ndarray) -> np.ndarray:
        """0/1 outlier labels (pyod convention): threshold at the
        (1 - contamination) quantile of the TRAIN-set scores.

        Train and test rows are scored in ONE batch so per-subspace
        ``zscore`` statistics are shared (a per-batch standardization would
        otherwise make the train-derived threshold incomparable to test
        scores), and the train rows' self-pairs are excluded for the
        neighbor-based detectors (pyod's kneighbors semantics — scoring a
        point against a train set containing itself would bias its k-th
        neighbor down to the (k-1)-th). ``threshold_`` is refreshed on
        every call (with ``zscore`` it is batch-dependent by construction).
        """
        if self.aggregation == "vote":
            # strict weighted majority of the per-subspace labels (combo's
            # majority_vote; ties are inliers — combo's argmax-on-counts
            # picks label 0 there too). Thresholds are train-derived per
            # member, so no combined batch is needed.
            frac = self._vote_scores(x_test)
            self._threshold = 0.5
            return (frac > 0.5).astype(np.int64)
        x_train = np.asarray(self._x_train)
        x_test = np.asarray(self._project(np.asarray(x_test)))
        if isinstance(self.base, str) and self.base in _NEIGHBOR_BASES:
            assert self.k < len(x_train), (
                "predict needs k < n_train (self-pairs are excluded when "
                "scoring the train rows)"
            )
        both = np.concatenate([x_train, x_test], axis=0)
        scores = self.decision_function(both, exclude_self=True)
        n_tr = len(x_train)
        self._threshold = float(
            np.quantile(scores[:n_tr], 1.0 - self.contamination)
        )
        return (scores[n_tr:] > self._threshold).astype(np.int64)

    @property
    def threshold_(self) -> Optional[float]:
        """Decision threshold once ``predict`` has been called (pyod name)."""
        return self._threshold

    def per_subspace_scores(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """Full (n_subspaces, nt) per-subspace score matrix, normalized per
        ``normalize`` — the suod-style intermediate the bucketed
        aggregations ('aom'/'moa') combine; also useful for per-subspace
        analysis. Honors ``mesh`` (mask-chunk axis sharded; the output
        gathers on host). ``exclude_self`` as in ``decision_function``."""
        s = self._raw_per_subspace(x_test, exclude_self=exclude_self)
        if self.normalize == "zscore":
            s = np.asarray(_zscore(jnp.asarray(s)))
        return s

    def _test_chunked_scores(self, x_test: np.ndarray) -> np.ndarray:
        """Aggregated scores for a test set scored in ``test_chunk``-row
        slices — n_test is unbounded at O(n_subspaces x test_chunk) device
        memory. Exact: 'zscore' uses GLOBAL per-subspace moments (one
        accumulation pass in float64, then a normalize+aggregate pass —
        each subspace's statistics are over the WHOLE test set, identical
        semantics to the one-shot path), and the bucketed aggregations
        reuse the same seeded bucket assignment per slice."""
        x_test = np.asarray(x_test, np.float32)
        nt = len(x_test)
        tc = self.test_chunk
        slices = [slice(i, min(i + tc, nt)) for i in range(0, nt, tc)]
        mu = sd = None
        raw_cache = None
        if self.normalize == "zscore":
            # cache the moments pass's raw slices on HOST when affordable
            # so the normalize+aggregate pass doesn't re-score (2x chip
            # work — and for pyod detector INSTANCES a re-score would
            # REFIT stochastic detectors, mis-normalizing pass 2 with
            # pass 1's moments; instances therefore always cache)
            fits_host = len(self.subspaces) * nt <= _TEST_CHUNK_CACHE_ELEMS
            if fits_host or not isinstance(self.base, str):
                raw_cache = []
            cnt = 0
            s1 = s2 = 0.0
            for sl in slices:
                s = self._raw_per_subspace(x_test[sl])
                if raw_cache is not None:
                    raw_cache.append(s)
                s64 = s.astype(np.float64)
                s1 = s1 + s64.sum(axis=1)
                s2 = s2 + (s64 * s64).sum(axis=1)
                cnt += s.shape[1]
            mu = s1 / cnt
            sd = np.sqrt(np.maximum(s2 / cnt - mu * mu, 0.0)) + 1e-12
        out = []
        keep = np.asarray(self.proba) > 0
        for i, sl in enumerate(slices):
            s = raw_cache[i] if raw_cache is not None else (
                self._raw_per_subspace(x_test[sl])
            )
            if mu is not None:
                s = (
                    (s.astype(np.float64) - mu[:, None]) / sd[:, None]
                ).astype(np.float32)
            if self.aggregation in ("aom", "moa", "median"):
                out.append(_bucket_aggregate(
                    s, self.proba, self.aggregation, self.n_buckets,
                    seed=self.bucket_seed,
                ))
            elif self.aggregation == "max":
                out.append(s[keep].max(axis=0))
            else:
                out.append(
                    (self._combining_weights()[:, None] * s).sum(axis=0)
                )
        return np.concatenate(out)

    def _raw_per_subspace(
        self, x_test: np.ndarray, exclude_self: bool = False
    ) -> np.ndarray:
        """UN-normalized (n_subspaces, nt) matrix (the raw scores under
        ``per_subspace_scores``; the test-chunked paths normalize with
        GLOBAL moments instead of per-call batch moments)."""
        assert self._x_train is not None, "call fit(X_train) first"
        x_test = self._project(np.asarray(x_test))
        if not isinstance(self.base, str):
            return self._pyod_per_subspace_raw(np.asarray(x_test))
        if self.base in _DIM_BASES:
            x_test_j = jnp.asarray(np.asarray(x_test), dtype=jnp.float32)
            masks = jnp.asarray(self.subspaces, dtype=jnp.float32)
            dim_scores = _dim_scores_jit(
                x_test_j, self._x_train, base=self.base, n_bins=self.n_bins
            )
            return np.asarray(_dim_subspace_raw(dim_scores, masks))
        x_test_j = jnp.asarray(np.asarray(x_test), dtype=jnp.float32)
        if self.base in ("knn", "knn_mean") and self.mesh is None:
            s = self._knn_fused_per_subspace(
                x_test_j, exclude_self=exclude_self
            )
            if s is not None:
                return s
        raw = self._native_scores(x_test_j, exclude_self, reduce=False)
        nt = x_test_j.shape[0]
        return np.asarray(raw).reshape(-1, nt)[: len(self.subspaces)]

    def _knn_fused_per_subspace(
        self, x_test, force: bool = False, exclude_self: bool = False
    ):
        """TPU fast path for the raw (n_masks, nt) matrix (same fused kernel
        as the aggregated path). Returns None when not applicable."""
        import jax as _jax

        from vgan_tpu.ops.pallas.knn_score import (
            knn_kernel_supported,
            knn_scores_all_masks,
        )

        on_tpu = _jax.default_backend() in ("tpu", "axon")
        if not (on_tpu or force):
            return None
        nt, d = x_test.shape
        ntr = self._x_train.shape[0]
        if not knn_kernel_supported(nt, ntr, d, self.k):
            return None
        if exclude_self and self.k >= ntr:
            return None
        return np.asarray(
            knn_scores_all_masks(
                x_test, self._x_train, self.subspaces, self.k,
                mode="mean" if self.base == "knn_mean" else "kth",
                exclude_self=exclude_self,
            )
        )

    def _pyod_per_subspace_raw(self, x_test: np.ndarray) -> np.ndarray:
        """(n_subspaces, nt) raw scores from a pyod-style detector loop."""
        x_train = np.asarray(self._x_train)
        all_scores = []
        for mask in self.subspaces:
            det = self.base.__class__(**self.base.get_params())
            det.fit(x_train[:, mask])
            all_scores.append(det.decision_function(x_test[:, mask]))
        return np.stack(all_scores)

    def _dim_decision_function(self, x_test) -> np.ndarray:
        """Dim-decomposable path (COPOD / HBOS / ECOD): per-dim score planes
        shared across ALL masks, the whole ensemble is masked-sum matmuls
        (one for copod/hbos, three + an elementwise max for ecod)."""
        x_test = jnp.asarray(np.asarray(x_test), dtype=jnp.float32)
        masks = jnp.asarray(self.subspaces, dtype=jnp.float32)
        proba = jnp.asarray(self.proba)
        return np.asarray(
            _dim_ensemble_scores(
                x_test, self._x_train, masks, proba,
                base=self.base, n_bins=self.n_bins,
                aggregation=self._reduce_aggregation,
                normalize=self.normalize,
            )
        )

    def _pyod_decision_function(self, x_test) -> np.ndarray:
        """CPU loop over subspaces with a pyod-style detector (clone per
        subspace). Used for parity checks; requires the detector to expose
        sklearn-style get_params/fit/decision_function."""
        scores = self._pyod_per_subspace_raw(np.asarray(x_test))
        if self.normalize == "zscore":
            scores = np.asarray(_zscore(jnp.asarray(scores)))
        if self.aggregation == "max":
            # zero-probability masks never win (consistent with every path)
            return np.where(
                self.proba[:, None] > 0, scores, -np.inf
            ).max(axis=0)
        return (self._combining_weights()[:, None] * scores).sum(axis=0)


def _dim_scores_impl(x_test, x_train, *, base, n_bins):
    if base == "hbos":
        return hbos_dim_scores(x_test, x_train, n_bins=n_bins)
    if base == "ecod":
        return ecod_dim_scores(x_test, x_train)
    return copod_dim_scores(x_test, x_train)


_dim_scores_jit = jax.jit(_dim_scores_impl, static_argnames=("base", "n_bins"))


def _dim_subspace_raw(dim_scores, masks):
    """Raw (n_masks, nt) per-subspace scores from per-dim planes.

    2-D planes (copod/hbos) are one masked-sum matmul; ECOD's (nt, d, 3)
    planes are three matmuls with the paper's elementwise max over the
    per-plane subspace sums."""
    if dim_scores.ndim == 3:  # ecod: (nt, d, planes)
        s3 = jnp.einsum(
            "tdp,md->mtp", dim_scores, masks,
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s3, axis=-1)
    return jnp.dot(dim_scores, masks.T, preferred_element_type=jnp.float32).T


@functools.partial(
    jax.jit, static_argnames=("base", "n_bins", "aggregation", "normalize")
)
def _dim_ensemble_scores(
    x_test, x_train, masks, proba, *, base, n_bins, aggregation, normalize
):
    dim_scores = _dim_scores_impl(x_test, x_train, base=base, n_bins=n_bins)
    s = _dim_subspace_raw(dim_scores, masks)
    if normalize == "zscore":
        s = _zscore(s)
    if aggregation == "max":
        # zero-probability masks never win (consistent with every path)
        s = jnp.where(proba[:, None] > 0, s, -jnp.inf)
        return jnp.max(s, axis=0)
    return jnp.sum(proba[:, None] * s, axis=0)


def _local_chunked_scores(
    x_test, x_train, masks, proba, *, scorer, k, aggregation, normalize
):
    """lax.map over mask chunks, vmap over masks inside; reduce over chunks.

    Padding rows (proba == 0) are neutralized: -inf for 'max', weight 0 for
    'average'. zscore normalization is per-subspace (axis=1) so padding rows
    never contaminate real rows.
    """

    def chunk_scores(args):
        mask_chunk, proba_chunk = args
        s = jax.vmap(lambda mk: scorer(x_test, x_train, mk, k))(mask_chunk)
        if normalize == "zscore":
            s = _zscore(s)
        if aggregation == "max":
            # masked-out padding rows must not win the max
            s = jnp.where(proba_chunk[:, None] > 0, s, -jnp.inf)
            return jnp.max(s, axis=0)
        return jnp.sum(proba_chunk[:, None] * s, axis=0)

    per_chunk = jax.lax.map(chunk_scores, (masks, proba))
    if aggregation == "max":
        return jnp.max(per_chunk, axis=0)
    return jnp.sum(per_chunk, axis=0)


@functools.partial(
    jax.jit, static_argnames=("scorer", "k", "aggregation", "normalize")
)
def _ensemble_scores(
    x_test, x_train, masks, proba, *, scorer, k, aggregation, normalize
):
    """One compiled program over all mask chunks (single device)."""
    return _local_chunked_scores(
        x_test, x_train, masks, proba,
        scorer=scorer, k=k, aggregation=aggregation, normalize=normalize,
    )


@functools.partial(jax.jit, static_argnames=("scorer", "k"))
def _per_subspace_chunked(x_test, x_train, masks, *, scorer, k):
    """(n_chunks, chunk, nt) raw per-subspace scores (no reduction)."""
    return jax.lax.map(
        lambda mk: jax.vmap(lambda m: scorer(x_test, x_train, m, k))(mk),
        masks,
    )


@functools.lru_cache(maxsize=32)
def _sharded_per_subspace_fn(mesh, scorer, k):
    """shard_map per-subspace scoring: each device scores its local mask
    chunks; the output stays sharded along the chunk axis (no collective —
    the host gather in ``per_subspace_scores`` assembles it)."""
    from jax import shard_map

    def local(x_test, x_train, masks_loc):
        return _per_subspace_chunked(
            x_test, x_train, masks_loc, scorer=scorer, k=k
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(),
                PartitionSpec("data", None, None),
            ),
            out_specs=PartitionSpec("data", None, None),
            check_vma=False,
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "mode", "exclude_self", "aggregation", "normalize", "interpret",
    ),
)
def _fused_knn_ensemble_scores(
    x_test, x_train, masks, proba, *, k, mode, exclude_self,
    aggregation, normalize, interpret,
):
    """ONE compiled program for the whole fused-KNN API call: pad + Pallas
    kernel + zscore + aggregation. A user-facing ``decision_function`` is
    then exactly one dispatch and one (nt,)-array fetch — on the axon
    tunnel (~20 ms per program call) the round-3 eager chain of pad ops,
    ``_zscore`` primitives, and the reduction cost ~6x the kernel itself
    (BENCH_r03's 59 ms API vs 9.9 ms kernel at the bench shape)."""
    from vgan_tpu.ops.pallas.knn_score import knn_scores_all_masks

    s = knn_scores_all_masks(
        x_test, x_train, masks, k, mode=mode, exclude_self=exclude_self,
        interpret=interpret,
    )
    if normalize == "zscore":
        s = _zscore(s)
    if aggregation == "max":
        # zero-probability masks never win (consistent with every path)
        s = jnp.where(proba[:, None] > 0, s, -jnp.inf)
        return jnp.max(s, axis=0)
    return jnp.sum(proba[:, None] * s, axis=0)


@functools.lru_cache(maxsize=32)
def _sharded_fused_knn_fn(mesh, k, mode, exclude_self, aggregation, normalize):
    """shard_map program over the FUSED projection+KNN kernel: each device
    runs the Pallas kernel on its local mask shard (replicated x), then one
    collective (psum for 'average', pmax for 'max') combines — the 5.8x
    fast path composed with the ensemble's mask-parallel axis."""
    from jax import lax, shard_map

    from vgan_tpu.ops.pallas.knn_score import knn_scores_all_masks

    def local(x_test, x_train, masks_loc, proba_loc):
        s = knn_scores_all_masks(
            x_test, x_train, masks_loc, k, mode=mode,
            exclude_self=exclude_self,
        )
        if normalize == "zscore":
            s = _zscore(s)
        if aggregation == "max":
            # zero-probability (incl. shard-padding) masks never win
            s = jnp.where(proba_loc[:, None] > 0, s, -jnp.inf)
            return lax.pmax(jnp.max(s, axis=0), "data")
        return lax.psum(jnp.sum(proba_loc[:, None] * s, axis=0), "data")

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(),
                PartitionSpec("data", None),
                PartitionSpec("data"),
            ),
            out_specs=PartitionSpec(),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=32)
def _sharded_ensemble_fn(mesh, scorer, k, aggregation, normalize):
    """shard_map program: each device scores its local mask chunks, then one
    collective (psum for 'average', pmax for 'max') combines. The mask axis
    is embarrassingly parallel, so this scales linearly over 'data'."""
    from jax import lax, shard_map

    def local(x_test, x_train, masks_loc, proba_loc):
        s = _local_chunked_scores(
            x_test, x_train, masks_loc, proba_loc,
            scorer=scorer, k=k, aggregation=aggregation, normalize=normalize,
        )
        if aggregation == "max":
            return lax.pmax(s, "data")
        return lax.psum(s, "data")

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(),
                PartitionSpec("data", None, None),
                PartitionSpec("data", None),
            ),
            out_specs=PartitionSpec(),
            check_vma=False,
        )
    )
