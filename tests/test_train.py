"""Training-core tests: schedule parity, bandwidth freezing, encoder-freeze
quirk, and a small end-to-end training run on the notebook's correlated
Gaussian (subspace distribution must concentrate on the dependent features).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vgan_tpu.ops.activations import binarize_mask
from vgan_tpu.train.steps import (
    AlternationSchedule,
    TrainConfig,
    init_kl_state,
    init_no_kl_state,
    kl_detector_epoch,
    kl_fit_program,
    kl_generator_epoch,
    no_kl_epoch,
    no_kl_fit_program,
)


def correlated_gaussian(n=400, d=10, rng=None):
    """The notebook's data family: features {0, 8, 9} strongly coupled
    (test.ipynb cell 2: cov 500 between those pairs, unit variance else)."""
    rng = rng or np.random.default_rng(7)
    cov = np.eye(d)
    for i in [0, 8, 9]:
        for j in [0, 8, 9]:
            if i != j:
                cov[i, j] = 0.95
    return rng.multivariate_normal(np.zeros(d), cov, size=n).astype(np.float32)


def test_alternation_schedule_default_cycle():
    s = AlternationSchedule(1, 5)
    phases = [s.next_phase() for _ in range(13)]
    assert phases == ["detector"] + ["generator"] * 5 + ["detector"] + [
        "generator"
    ] * 5 + ["detector"]


def test_alternation_schedule_2_3():
    s = AlternationSchedule(2, 3)
    phases = [s.next_phase() for _ in range(11)]
    assert phases == ["detector"] * 2 + ["generator"] * 3 + ["detector"] * 2 + [
        "generator"
    ] * 3 + ["detector"]


def test_alternation_schedule_d0_idles_after_one_cycle():
    # Reference parity: with iternum_d=0 the generator counter is never reset
    # (vgan.py:251-293), so after one generator cycle every epoch is a no-op.
    s = AlternationSchedule(0, 2)
    phases = [s.next_phase() for _ in range(6)]
    assert phases == ["generator"] * 2 + ["idle"] * 4


def test_no_kl_epoch_runs_and_freezes_bandwidth():
    x = jnp.asarray(correlated_gaussian(n=128, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    state = init_no_kl_state(config, jax.random.PRNGKey(0))
    assert not bool(state.bw_is_set)

    state1, loss1 = no_kl_epoch(state, x, config)
    assert np.isfinite(float(loss1))
    assert bool(state1.bw_is_set)
    bw_after_1 = float(state1.bw_value)
    assert bw_after_1 > 0

    state2, loss2 = no_kl_epoch(state1, x, config)
    # frozen: bandwidth unchanged in later epochs
    assert float(state2.bw_value) == bw_after_1


def test_no_kl_unfrozen_bandwidth_flag():
    x = jnp.asarray(correlated_gaussian(n=128, d=10))
    config = TrainConfig(ndims=10, batch_size=32, freeze_bandwidth=False, mmd_impl="jnp")
    state = init_no_kl_state(config, jax.random.PRNGKey(0))
    state1, _ = no_kl_epoch(state, x, config)
    assert not bool(state1.bw_is_set)


def test_kl_encoder_freeze_quirk():
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    state = init_kl_state(config, jax.random.PRNGKey(1))

    enc0 = np.asarray(state.det_params["params"]["encoder"]["Dense_0"]["kernel"])
    dec0 = np.asarray(state.det_params["params"]["decoder"]["Dense_0"]["kernel"])

    # first detector epoch: both encoder and decoder train
    state, _ = kl_detector_epoch(state, x, config)
    enc1 = np.asarray(state.det_params["params"]["encoder"]["Dense_0"]["kernel"])
    dec1 = np.asarray(state.det_params["params"]["decoder"]["Dense_0"]["kernel"])
    assert not np.allclose(enc0, enc1)
    assert not np.allclose(dec0, dec1)

    # generator epoch flips the freeze leak
    state, _ = kl_generator_epoch(state, x, config)
    assert not bool(state.encoder_active)

    # later detector epochs: decoder still trains, encoder is stuck
    state, _ = kl_detector_epoch(state, x, config)
    enc2 = np.asarray(state.det_params["params"]["encoder"]["Dense_0"]["kernel"])
    dec2 = np.asarray(state.det_params["params"]["decoder"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(enc1, enc2)
    assert not np.allclose(dec1, dec2)


def test_kl_generator_epoch_trains_generator_when_detach_off():
    """With replicate_generator_detach=False (the paper's intended GAN), the
    generator epoch updates ONLY generator params."""
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(
        ndims=10, batch_size=32, mmd_impl="jnp", replicate_generator_detach=False
    )
    state = init_kl_state(config, jax.random.PRNGKey(2))
    det_before = jax.tree.map(np.asarray, state.det_params)
    gen_before = np.asarray(state.gen_params["params"]["Dense_0"]["kernel"])

    state, loss = kl_generator_epoch(state, x, config)
    assert np.isfinite(float(loss))
    jax.tree.map(
        np.testing.assert_array_equal, det_before, jax.tree.map(np.asarray, state.det_params)
    )
    assert not np.allclose(gen_before, np.asarray(state.gen_params["params"]["Dense_0"]["kernel"]))


def test_kl_generator_detach_quirk_freezes_generator():
    """Reference-exact default: torch 2.x Variable() DETACHES, so the
    reference's kl generator never trains (vgan.py:308-309; verified by
    running the reference — identical mask distributions at 15 and 200
    epochs). The generator epoch must leave generator params and optimizer
    state untouched while still evaluating the loss and advancing the
    bandwidth state."""
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    assert config.replicate_generator_detach  # the default
    state = init_kl_state(config, jax.random.PRNGKey(2))
    gen_before = jax.tree.map(np.asarray, state.gen_params)

    state, loss = kl_generator_epoch(state, x, config)
    assert np.isfinite(float(loss))
    jax.tree.map(
        np.testing.assert_array_equal, gen_before,
        jax.tree.map(np.asarray, state.gen_params),
    )
    assert bool(state.bw_is_set)


def test_no_kl_fit_program_equals_epoch_loop():
    """The whole-fit single XLA program must produce bit-identical results to
    the per-epoch jitted calls (same RNG threading)."""
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    key = jax.random.PRNGKey(5)

    state_a = init_no_kl_state(config, key)
    losses_a = []
    for _ in range(3):
        state_a, loss = no_kl_epoch(state_a, x, config)
        losses_a.append(float(loss))

    state_b, losses_b = no_kl_fit_program(x, key, config, 3)
    np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_a.params["params"]["Dense_3"]["kernel"]),
        np.asarray(state_b.params["params"]["Dense_3"]["kernel"]),
        rtol=1e-6,
    )


def test_kl_fit_program_equals_epoch_loop():
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    key = jax.random.PRNGKey(6)
    epochs = 7  # D G G G G G D under the default 1:5 schedule

    state_a = init_kl_state(config, key)
    det_hist, gen_hist = [], []
    last_d, last_g = float("nan"), float("nan")
    sched = AlternationSchedule(config.iternum_d, config.iternum_g)
    for _ in range(epochs):
        phase = sched.next_phase()
        if phase == AlternationSchedule.DETECTOR:
            state_a, loss = kl_detector_epoch(state_a, x, config)
            last_d = float(loss)
        else:
            state_a, loss = kl_generator_epoch(state_a, x, config)
            last_g = float(loss)
        det_hist.append(last_d)
        gen_hist.append(last_g)

    phases = AlternationSchedule(config.iternum_d, config.iternum_g).phase_array(epochs)
    state_b, det_b, gen_b = kl_fit_program(x, key, jnp.asarray(phases), config)
    # nested-in-program vs standalone jit fuse slightly differently (~1e-7
    # fp variance); the RNG stream and math are identical
    np.testing.assert_allclose(det_hist, np.asarray(det_b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gen_hist, np.asarray(gen_b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_a.gen_params["params"]["Dense_3"]["kernel"]),
        np.asarray(state_b.gen_params["params"]["Dense_3"]["kernel"]),
        rtol=1e-4, atol=1e-7,
    )


def test_fit_deterministic_per_seed():
    """Two runs with the same seed produce bit-identical histories and
    parameters (determinism guarantee the reference can't make across
    devices; SURVEY.md section 4 property test)."""
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    config = TrainConfig(ndims=10, batch_size=32, mmd_impl="jnp")
    key = jax.random.PRNGKey(9)
    s1, l1 = no_kl_fit_program(x, key, config, 3)
    s2, l2 = no_kl_fit_program(x, key, config, 3)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1.params, s2.params,
    )


def test_no_kl_training_mask_distribution_collapses():
    """End-to-end dynamics check (mini version of test.ipynb cells 2-12).

    The reference's behavioral signature after a short no-kl run is a small
    discrete support: 500 sampled masks collapse to ~8 unique subspaces with
    a dominant mode (test.ipynb cell 12), and the epoch loss sits in the
    4.3-4.6 band (cell 4). Ours reproduces that shape: few unique structured
    masks, dominant mode, loss in the same ballpark.
    """
    x = jnp.asarray(correlated_gaussian(n=512, d=10))
    config = TrainConfig(ndims=10, batch_size=128, lr_g=0.01, mmd_impl="jnp")
    state = init_no_kl_state(config, jax.random.PRNGKey(3))
    for _ in range(20):
        state, loss = no_kl_epoch(state, x, config)
    assert np.isfinite(float(loss))
    assert 1.0 < float(loss) < 12.0  # notebook band is ~4.3-4.6 on its data

    gen = config.generator_module(kl=False)
    z = jax.random.normal(jax.random.PRNGKey(777), (500, config.latent_size))
    u = np.asarray(binarize_mask(gen.apply(state.params, z), axis=-1))

    uniq, counts = np.unique(u, axis=0, return_counts=True)
    assert len(uniq) <= 64, f"mask support did not collapse: {len(uniq)} unique"
    assert counts.max() / 500 > 0.2, "no dominant mode in the mask distribution"
    # masks are non-trivial (not all-ones / all-zeros)
    assert 0 < u.mean() < 1


def test_fit_program_rejects_too_small_dataset(rng):
    """Round-2 review: the public fit programs must raise on n < batch_size
    instead of training zero batches and returning NaN losses."""
    import pytest as _pytest

    from vgan_tpu.train.steps import TrainConfig, no_kl_fit_program

    x = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    config = TrainConfig(ndims=8, batch_size=50)
    with _pytest.raises(ValueError, match="batch_size"):
        no_kl_fit_program(x, jax.random.PRNGKey(0), config, 2)


def test_idle_epochs_preserve_rng_equivalence(rng):
    """Round-2 review: IDLE epochs must consume the same one key-split in
    the fallback path as the precomputed-RNG chain does, so both paths give
    identical streams for the epochs after an idle one."""
    from vgan_tpu.train.steps import (
        PRECOMPUTE_PERM_LIMIT,
        TrainConfig,
        init_kl_state,
        kl_train_epochs,
    )
    import vgan_tpu.train.steps as steps_mod

    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    config = TrainConfig(ndims=8, batch_size=16, mmd_impl="jnp")
    phases = jnp.asarray([0, 2, 1, 1], jnp.int32)  # det, IDLE, gen, gen

    state0 = init_kl_state(config, jax.random.PRNGKey(3))
    _, det_a, gen_a = kl_train_epochs(state0, x, phases, config)

    old = steps_mod.PRECOMPUTE_PERM_LIMIT
    steps_mod.PRECOMPUTE_PERM_LIMIT = 0  # force the fallback path
    jax.clear_caches()  # the limit is read at trace time: force a retrace
    try:
        _, det_b, gen_b = kl_train_epochs(state0, x, phases, config)
    finally:
        steps_mod.PRECOMPUTE_PERM_LIMIT = old
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(det_a), np.asarray(det_b),
                               rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(np.asarray(gen_a), np.asarray(gen_b),
                               rtol=1e-6, equal_nan=True)


def test_bf16_model_and_opt_state_fit_close_to_f32(rng):
    """Round 3 stress-regime options: model_matmul_dtype='bfloat16' (bf16
    Dense operands, f32 masters + f32 pre-softmax logits) and
    opt_state_dtype='bfloat16' (bf16-stored Adadelta EMAs, f32 math) train
    to nearly the f32 trajectory on the reference-scale problem."""
    from vgan_tpu.ops.activations import binarize_mask
    from vgan_tpu.train.steps import TrainConfig, no_kl_fit_program

    x = jnp.asarray(rng.normal(size=(128, 32)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    cfg32 = TrainConfig(ndims=32, batch_size=32, lr_g=0.01)
    cfg16 = TrainConfig(
        ndims=32, batch_size=32, lr_g=0.01,
        model_matmul_dtype="bfloat16", opt_state_dtype="bfloat16",
    )
    st32, losses32 = no_kl_fit_program(x, key, cfg32, epochs=6)
    st16, losses16 = no_kl_fit_program(x, key, cfg16, epochs=6)
    assert np.all(np.isfinite(np.asarray(losses16)))
    np.testing.assert_allclose(
        np.asarray(losses16), np.asarray(losses32), rtol=0.08
    )
    # the binarized masks of a shared noise batch mostly agree
    gen = cfg32.generator_module(kl=False)
    gen16 = cfg16.generator_module(kl=False)
    z = jax.random.normal(jax.random.PRNGKey(0), (64, cfg32.latent_size))
    m32 = binarize_mask(gen.apply(st32.params, z), axis=-1)
    m16 = binarize_mask(gen16.apply(st16.params, z), axis=-1)
    assert np.mean(np.asarray(m32) == np.asarray(m16)) > 0.97

    # opt-state dtype is what was asked for
    leaf = jax.tree.leaves(st16.opt_state.square_avg)[0]
    assert leaf.dtype == jnp.bfloat16
    leaf32 = jax.tree.leaves(st32.opt_state.square_avg)[0]
    assert leaf32.dtype == jnp.float32


def test_generator_grad_estimators_train_the_kl_generator():
    """Round-4 VERDICT item 1: 'st' and 'gumbel_st' are opt-in binarization
    gradient estimators that actually move the kl generator (the reference
    estimator zeroes the gradient through every selected coordinate). Both
    must produce finite losses and update generator params; detector params
    stay untouched in the generator phase."""
    x = jnp.asarray(correlated_gaussian(n=96, d=10))
    for gg in ("st", "gumbel_st"):
        config = TrainConfig(
            ndims=10, batch_size=32, mmd_impl="jnp",
            replicate_generator_detach=False, generator_grad=gg,
        )
        state = init_kl_state(config, jax.random.PRNGKey(2))
        det_before = jax.tree.map(np.asarray, state.det_params)
        gen_before = np.asarray(
            state.gen_params["params"]["Dense_0"]["kernel"]
        )
        state, loss = kl_generator_epoch(state, x, config)
        assert np.isfinite(float(loss)), gg
        assert not np.allclose(
            gen_before,
            np.asarray(state.gen_params["params"]["Dense_0"]["kernel"]),
        ), gg
        jax.tree.map(
            np.testing.assert_array_equal, det_before,
            jax.tree.map(np.asarray, state.det_params),
        )
        # the detector phase also runs under the non-reference estimator
        state, d_loss = kl_detector_epoch(state, x, config)
        assert np.isfinite(float(d_loss)), gg


def test_generator_grad_st_forward_matches_reference_estimator():
    """'st' changes ONLY the backward: a full no-kl fit under 'st' follows
    a different parameter trajectory, but module forwards of the SAME params
    are bit-identical between the train-time 'st' module and the
    deterministic sampling module."""
    from vgan_tpu.ops.activations import binarize_mask

    x = jnp.asarray(correlated_gaussian(n=128, d=10))
    cfg = TrainConfig(
        ndims=10, batch_size=32, mmd_impl="jnp", generator_grad="st"
    )
    state, losses = no_kl_fit_program(x, jax.random.PRNGKey(0), cfg, epochs=4)
    assert np.all(np.isfinite(np.asarray(losses)))
    z = jax.random.normal(jax.random.PRNGKey(1), (32, cfg.latent_size))
    train_mod = cfg.generator_module(kl=False, train=True)
    infer_mod = cfg.generator_module(kl=False)  # deterministic sampling
    np.testing.assert_array_equal(
        np.asarray(train_mod.apply(state.params, z)),
        np.asarray(infer_mod.apply(state.params, z)),
    )
    # sampling stays deterministic under any estimator
    m1 = np.asarray(binarize_mask(infer_mod.apply(state.params, z), axis=-1))
    m2 = np.asarray(binarize_mask(infer_mod.apply(state.params, z), axis=-1))
    np.testing.assert_array_equal(m1, m2)


def test_gumbel_st_rejects_external_noise_injection():
    from vgan_tpu.train.steps import _gumbel_keys

    noise_array = jnp.zeros((3, 8, 2))
    try:
        _gumbel_keys(noise_array, 3)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "gumbel_st" in str(e)


def test_api_gumbel_st_fit_and_sample():
    """API surface: VGAN(generator_grad='gumbel_st',
    replicate_generator_detach=False) fits and samples deterministically
    (the sampling path uses the deterministic upper-softmax module)."""
    from vgan_tpu import VGAN

    x = correlated_gaussian(n=96, d=10)
    m = VGAN(
        epochs=7, batch_size=32, verbose=False,
        replicate_generator_detach=False, generator_grad="gumbel_st",
        mmd_impl="jnp",
    )
    m.fit(x)
    u1 = m.generate_subspaces(16)
    u2 = m.generate_subspaces(16)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    # epoch 0 is a detector epoch -> generator loss is NaN there
    # (reference last-seen-loss history semantics, vgan.py:232-233)
    assert np.all(np.isfinite(m.train_history["generator_loss"][1:]))
    assert np.all(np.isfinite(m.train_history["detector_loss"]))


def test_latent_size_override():
    """Round-4 VERDICT item 6 support: VGAN(latent_size=) overrides the
    reference capacity rule max(d//16, 1) (reference vgan.py:196) down to
    the compiled program's parameter shapes; the default (None) keeps
    reference parity."""
    from vgan_tpu import VGAN

    assert TrainConfig(ndims=128, batch_size=32).latent_size == 8
    cfg = TrainConfig(ndims=128, batch_size=32, latent_override=32)
    assert cfg.latent_size == 32
    state = init_kl_state(cfg, jax.random.PRNGKey(0))
    kernel = state.gen_params["params"]["Dense_0"]["kernel"]
    assert kernel.shape[0] == 32

    x = correlated_gaussian(n=64, d=10)
    m = VGAN(epochs=3, batch_size=32, verbose=False, latent_size=4,
             mmd_impl="jnp")
    m.fit(x)  # reference rule would give max(10//16, 1) = 1
    assert m._config.latent_size == 4
    assert m.generate_subspaces(8).shape == (8, 10)
    assert VGAN(latent_size=None)._make_config(10, 32).latent_size == 1
