"""Sharded-MMD and data-parallel fit equivalence on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from jax import shard_map

from vgan_tpu.ops import mmd as M
from vgan_tpu.parallel.mesh import make_mesh
from vgan_tpu.parallel.ring import (
    mmd2_feature_sharded,
    mmd2_ring_rowsharded,
    mmd_loss_ring_rowsharded,
)
from vgan_tpu.train.steps import TrainConfig, no_kl_fit_program
from vgan_tpu.parallel.dp import no_kl_fit_program_dp, kl_fit_program_dp
from vgan_tpu.train.steps import AlternationSchedule


def data_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("data",))


def test_ring_mmd_matches_single_device(rng):
    n, d = 64, 12  # 8 rows per device
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) + 0.4)
    ref, bw_ref = M.mmd2_biased_stateful(
        x, y, jnp.zeros(()), jnp.asarray(False)
    )

    mesh = data_mesh()
    fn = shard_map(
        lambda xl, yl: mmd2_ring_rowsharded(
            xl, yl, jnp.zeros(()), jnp.asarray(False), "data"
        ),
        mesh=mesh,
        in_specs=(PartitionSpec("data", None), PartitionSpec("data", None)),
        out_specs=(PartitionSpec(), PartitionSpec()),
    )
    ring, bw_ring = jax.jit(fn)(x, y)
    np.testing.assert_allclose(float(ring), float(ref), rtol=1e-4)
    np.testing.assert_allclose(float(bw_ring), float(bw_ref), rtol=1e-4)


def test_ring_mmd_gradients_match(rng):
    n, d = 32, 6
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) + 0.4)
    bw = jnp.asarray(2.5, jnp.float32)

    g_ref = jax.grad(
        lambda y_: M.mmd2_biased_stateful(x, y_, bw, jnp.asarray(True))[0]
    )(y)

    mesh = data_mesh()
    fn = shard_map(
        lambda xl, yl: mmd2_ring_rowsharded(xl, yl, bw, jnp.asarray(True), "data")[0],
        mesh=mesh,
        in_specs=(PartitionSpec("data", None), PartitionSpec("data", None)),
        out_specs=PartitionSpec(),
    )
    g_ring = jax.grad(lambda y_: jax.jit(fn)(x, y_))(y)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), rtol=1e-3, atol=1e-7)


def test_ring_loss_coverage_penalty(rng):
    n, d = 32, 10
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    u = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))
    y = u * x
    loss_ref, _ = M.mmd_loss_constrained_stateful(
        x, y, u, 10.0, jnp.zeros(()), jnp.asarray(False)
    )
    mesh = data_mesh()
    fn = shard_map(
        lambda xl, yl, ul: mmd_loss_ring_rowsharded(
            xl, yl, ul, 10.0, jnp.zeros(()), jnp.asarray(False), "data"
        ),
        mesh=mesh,
        in_specs=(PartitionSpec("data", None),) * 3,
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,  # outputs replicated via psum/all_gather
    )
    loss_ring, _ = jax.jit(fn)(x, y, u)
    np.testing.assert_allclose(float(loss_ring), float(loss_ref), rtol=1e-4)


def test_feature_sharded_mmd_matches(rng):
    n, d = 24, 40  # 5 features per device over 8 devices
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) + 0.2)
    ref, bw_ref = M.mmd2_biased_stateful(x, y, jnp.zeros(()), jnp.asarray(False))

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("model",))
    fn = shard_map(
        lambda xl, yl: mmd2_feature_sharded(
            xl, yl, jnp.zeros(()), jnp.asarray(False), "model"
        ),
        mesh=mesh,
        in_specs=(PartitionSpec(None, "model"), PartitionSpec(None, "model")),
        out_specs=(PartitionSpec(), PartitionSpec()),
    )
    fs, bw_fs = jax.jit(fn)(x, y)
    np.testing.assert_allclose(float(fs), float(ref), rtol=1e-4)
    np.testing.assert_allclose(float(bw_fs), float(bw_ref), rtol=1e-4)


def test_dp_fit_matches_single_device(rng):
    x = rng.normal(size=(128, 16)).astype(np.float32)
    config = TrainConfig(ndims=16, batch_size=32, mmd_impl="jnp")
    key = jax.random.PRNGKey(1)

    state_ref, losses_ref = no_kl_fit_program(jnp.asarray(x), key, config, 3)

    mesh = make_mesh(data=4, model=2)
    state_dp, losses_dp = no_kl_fit_program_dp(x, key, config, 3, mesh)
    np.testing.assert_allclose(
        np.asarray(losses_dp), np.asarray(losses_ref), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state_dp.params["params"]["Dense_3"]["kernel"]),
        np.asarray(state_ref.params["params"]["Dense_3"]["kernel"]),
        rtol=1e-3, atol=1e-6,
    )


def test_estimator_api_with_mesh(rng):
    """Passing mesh= to the estimator runs the fit data-parallel and matches
    the single-device fit exactly (same program, sharded placement)."""
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(128, 16)).astype(np.float32)
    m_ref = VGAN_no_kl(batch_size=32, epochs=3, verbose=False)
    m_ref.fit(x)

    mesh = make_mesh(data=4, model=2)
    m_dp = VGAN_no_kl(batch_size=32, epochs=3, verbose=False, mesh=mesh)
    m_dp.fit(x)

    np.testing.assert_allclose(
        m_dp.train_history["generator_loss"],
        m_ref.train_history["generator_loss"],
        rtol=1e-4,
    )
    np.testing.assert_array_equal(
        m_dp.generate_subspaces(16), m_ref.generate_subspaces(16)
    )


def test_shard_dataset_single_host(rng):
    from vgan_tpu.parallel.input import process_row_range, shard_dataset

    mesh = make_mesh(data=4, model=2)
    x = rng.normal(size=(32, 8)).astype(np.float32)
    xs = shard_dataset(x, mesh, shard_features=True)
    assert xs.shape == (32, 8)
    np.testing.assert_allclose(np.asarray(xs), x)
    assert process_row_range(100) == (0, 100)  # single process owns all rows


def test_elm_flag_freezes_encoder_from_start(rng):
    """The reference's private __elm flag (vgan.py:45, 248-250): with it on,
    the encoder never trains, from epoch 0."""
    from vgan_tpu import VGAN

    x = rng.normal(size=(96, 10)).astype(np.float32)
    m = VGAN(batch_size=32, epochs=2, verbose=False, elm=True)
    m.fit(x)
    from vgan_tpu.train.steps import TrainConfig, init_kl_state
    import jax as _jax

    init = init_kl_state(m._config, _jax.random.PRNGKey(m.seed))
    # rtol 1e-6: the fit initializes inside jit, where the normal-transform
    # fuses differently than the eager init here (~1e-7 fp variance); an
    # actually-trained encoder moves by orders of magnitude more
    np.testing.assert_allclose(
        np.asarray(init.det_params["params"]["encoder"]["Dense_0"]["kernel"]),
        np.asarray(m.detector_params["params"]["encoder"]["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-8,
    )
    assert not np.allclose(
        np.asarray(init.det_params["params"]["decoder"]["Dense_0"]["kernel"]),
        np.asarray(m.detector_params["params"]["decoder"]["Dense_0"]["kernel"]),
    )


def test_elm_independent_of_quirks_flag(rng):
    """elm must freeze the encoder even with replicate_reference_quirks off
    (review finding: the OR re-enabled it)."""
    from vgan_tpu import VGAN
    from vgan_tpu.train.steps import init_kl_state
    import jax as _jax

    x = rng.normal(size=(96, 10)).astype(np.float32)
    m = VGAN(batch_size=32, epochs=2, verbose=False, elm=True,
             replicate_reference_quirks=False)
    m.fit(x)
    init = init_kl_state(m._config, _jax.random.PRNGKey(m.seed))
    np.testing.assert_allclose(
        np.asarray(init.det_params["params"]["encoder"]["Dense_0"]["kernel"]),
        np.asarray(m.detector_params["params"]["encoder"]["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-8,
    )


def test_dp_kl_fit_runs(rng):
    x = rng.normal(size=(128, 32)).astype(np.float32)
    config = TrainConfig(ndims=32, batch_size=32, mmd_impl="jnp")
    phases = AlternationSchedule(1, 5).phase_array(4)
    mesh = make_mesh(data=8, model=1)
    state, det_hist, gen_hist = kl_fit_program_dp(
        x, jax.random.PRNGKey(2), phases, config, mesh, shard_features=False
    )
    assert np.isfinite(np.asarray(det_hist)[0])
    assert np.isfinite(np.asarray(gen_hist)[-1])


def test_sharded_ensemble_matches_single_device(rng):
    """Mask-sharded SubspaceEnsemble (mesh=) == single-device ensemble
    (SURVEY.md section 2b ensemble axis; VERDICT round-1 missing #4)."""
    from vgan_tpu.ensemble import SubspaceEnsemble

    d = 12
    xtr = rng.normal(size=(60, d)).astype(np.float32)
    xte = rng.normal(size=(20, d)).astype(np.float32)
    n_masks = 13  # deliberately not a multiple of chunk * n_devices
    masks = rng.random(size=(n_masks, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)  # no empty masks
    proba = rng.random(size=(n_masks,)).astype(np.float32)
    proba /= proba.sum()

    mesh = data_mesh()
    for base in ("knn", "lof", "abod", "cof", "mahalanobis", "cblof",
                 "gmm", "loda", "kde", "inne", "pca", "sampling", "kpca",
                 "mcd", "ae", "dsvdd", "sod", "ocsvm", "sos", "lmdd"):
        for agg in ("average", "max"):
            single = SubspaceEnsemble(
                masks, proba, base=base, k=5, aggregation=agg, chunk=2
            ).fit(xtr).decision_function(xte)
            sharded = SubspaceEnsemble(
                masks, proba, base=base, k=5, aggregation=agg, chunk=2,
                mesh=mesh,
            ).fit(xtr).decision_function(xte)
            np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_sharded_per_subspace_scores_match_single_device(rng):
    """Mask-sharded per_subspace_scores (the 'aom'/'moa' intermediate) ==
    single-device; bucketed aggregation identical over the mesh."""
    from vgan_tpu.ensemble import SubspaceEnsemble

    d = 10
    xtr = rng.normal(size=(50, d)).astype(np.float32)
    xte = rng.normal(size=(15, d)).astype(np.float32)
    n_masks = 11  # not a multiple of chunk * n_devices
    masks = rng.random(size=(n_masks, d)) < 0.5
    masks[:, 0] |= ~masks.any(axis=1)
    proba = np.full((n_masks,), 1.0 / n_masks, np.float32)

    mesh = data_mesh()
    kw = dict(base="knn", k=4, chunk=2, aggregation="aom", n_buckets=3)
    single = SubspaceEnsemble(masks, proba, **kw).fit(xtr)
    sharded = SubspaceEnsemble(masks, proba, mesh=mesh, **kw).fit(xtr)
    np.testing.assert_allclose(
        sharded.per_subspace_scores(xte),
        single.per_subspace_scores(xte),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        sharded.decision_function(xte),
        single.decision_function(xte),
        rtol=1e-5, atol=1e-6,
    )


def test_sharded_tiled_gof_matches_single_device(rng):
    """Permutation-sharded streaming GoF (mesh=) == single-device tiled path
    (identical permutation draws; rows of C = A @ K are independent)."""
    from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled

    x = rng.normal(size=(40, 5)).astype(np.float32)
    y = (rng.normal(size=(36, 5)) * 1.2 + 0.4).astype(np.float32)
    key = jax.random.PRNGKey(7)
    # 61 rows (observed + 60 perms): not a multiple of 8 devices
    s1, p1 = mmd_permutation_test_tiled(x, y, [0.5], key, n_permutations=60)
    s8, p8 = mmd_permutation_test_tiled(
        x, y, [0.5], key, n_permutations=60, mesh=data_mesh()
    )
    np.testing.assert_allclose(float(s8), float(s1), rtol=1e-6)
    np.testing.assert_allclose(float(p8), float(p1), atol=1e-9)


def test_make_mesh_rejects_oversubscription():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="devices"):
        make_mesh(data=64, model=1)
    with _pytest.raises(ValueError, match="devices"):
        make_mesh(data=None, model=64)  # data would be 0


def test_continue_fit_keeps_mesh_sharding(rng):
    """Round-2 review: continue_fit must place the dataset with the same
    mesh sharding fit() used (it previously fell back to a plain asarray)."""
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(64, 8)).astype(np.float32)
    mesh = data_mesh()
    m = VGAN_no_kl(batch_size=16, epochs=2, verbose=False, mesh=mesh)
    m.fit(x)
    m.continue_fit(x, epochs=2)
    assert len(m.train_history["generator_loss"]) == 4
    assert np.isfinite(m.train_history["generator_loss"][-1])
