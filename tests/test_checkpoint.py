"""Checkpoint/resume: full-train-state round-trip and exact continuation."""

import numpy as np

from vgan_tpu import VGAN, VGAN_no_kl


def data(rng, n=96, d=10):
    return rng.normal(size=(n, d)).astype(np.float32)


def test_no_kl_checkpoint_roundtrip_exact_resume(tmp_path, rng):
    x = data(rng)

    # one uninterrupted 6-epoch run
    m_full = VGAN_no_kl(batch_size=32, epochs=6, verbose=False)
    m_full.fit(x)

    # 3 epochs, checkpoint, restore into a fresh estimator, 3 more
    m_a = VGAN_no_kl(batch_size=32, epochs=3, verbose=False)
    m_a.fit(x)
    m_a.save_checkpoint(tmp_path / "ckpt")

    m_b = VGAN_no_kl(batch_size=32, epochs=3, verbose=False)
    m_b.restore_checkpoint(tmp_path / "ckpt")
    m_b.continue_fit(x, 3)

    np.testing.assert_allclose(
        m_b.train_history["generator_loss"],
        m_full.train_history["generator_loss"],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        m_b.generate_subspaces(16), m_full.generate_subspaces(16)
    )


def test_kl_checkpoint_resume_across_phase_boundary(tmp_path, rng):
    x = data(rng)
    m_full = VGAN(batch_size=32, epochs=8, verbose=False)
    m_full.fit(x)

    # split mid-generator-phase (epoch 4 of the 1D+5G cycle)
    m_a = VGAN(batch_size=32, epochs=4, verbose=False)
    m_a.fit(x)
    m_a.save_checkpoint(tmp_path / "ckpt")

    m_b = VGAN(batch_size=32, epochs=4, verbose=False)
    m_b.restore_checkpoint(tmp_path / "ckpt")
    m_b.continue_fit(x, 4)

    np.testing.assert_allclose(
        m_b.train_history["generator_loss"],
        m_full.train_history["generator_loss"],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        m_b.train_history["detector_loss"],
        m_full.train_history["detector_loss"],
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        m_b.generate_subspaces(16), m_full.generate_subspaces(16)
    )


def test_auto_checkpointing_fit(tmp_path, rng):
    """checkpoint_every triggers periodic full-state saves during fit, and
    chunked execution matches the single-program fit exactly."""
    x = data(rng)
    ck = tmp_path / "auto"
    m = VGAN_no_kl(batch_size=32, epochs=6, verbose=False,
                   checkpoint_dir=ck, checkpoint_every=2)
    m.fit(x)
    from vgan_tpu.utils.checkpoint import load_meta

    assert load_meta(ck) is not None

    m_ref = VGAN_no_kl(batch_size=32, epochs=6, verbose=False)
    m_ref.fit(x)
    np.testing.assert_allclose(
        m.train_history["generator_loss"],
        m_ref.train_history["generator_loss"],
        rtol=1e-6,
    )

    # the checkpoint on disk is the final state: restoring reproduces sampling
    m2 = VGAN_no_kl(batch_size=32, verbose=False).restore_checkpoint(ck)
    np.testing.assert_array_equal(
        m2.generate_subspaces(8), m.generate_subspaces(8)
    )


def test_kl_auto_checkpointing_chunks_match(tmp_path, rng):
    x = data(rng)
    m = VGAN(batch_size=32, epochs=8, verbose=False,
             checkpoint_dir=tmp_path / "klauto", checkpoint_every=3)
    m.fit(x)
    m_ref = VGAN(batch_size=32, epochs=8, verbose=False)
    m_ref.fit(x)
    np.testing.assert_allclose(
        m.train_history["detector_loss"], m_ref.train_history["detector_loss"],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        m.train_history["generator_loss"], m_ref.train_history["generator_loss"],
        rtol=1e-5,
    )


def test_continue_fit_rejects_too_small_dataset(tmp_path, rng):
    """Review finding: drop-last batching would silently train zero batches."""
    x = data(rng, n=96)
    m = VGAN_no_kl(batch_size=64, epochs=1, verbose=False)
    m.fit(x)

    import pytest

    with pytest.raises(ValueError, match="zero batches"):
        m.continue_fit(x[:32], 1)


def test_periodic_checkpoint_preserves_bandwidth(tmp_path, rng):
    """Review finding: mid-fit saves stored bandwidth=None in metadata."""
    x = data(rng)
    ck = tmp_path / "bw"
    m = VGAN_no_kl(batch_size=32, epochs=4, verbose=False,
                   checkpoint_dir=ck, checkpoint_every=2)
    m.fit(x)
    m2 = VGAN_no_kl(batch_size=32, verbose=False).restore_checkpoint(ck)
    assert m2.bandwidth is not None and m2.bandwidth > 0
    np.testing.assert_allclose(m2.bandwidth, m.bandwidth, rtol=1e-6)


def test_checkpoint_class_mismatch_rejected(tmp_path, rng):
    x = data(rng)
    m = VGAN_no_kl(batch_size=32, epochs=1, verbose=False)
    m.fit(x)
    m.save_checkpoint(tmp_path / "ckpt")

    import pytest

    with pytest.raises(AssertionError, match="checkpoint is for"):
        VGAN(verbose=False).restore_checkpoint(tmp_path / "ckpt")


def test_refit_checkpoint_stores_live_bandwidth(tmp_path, rng):
    """Review finding: a second fit's periodic checkpoints persisted the
    FIRST fit's self.bandwidth instead of the live state's frozen value."""
    x1 = data(rng)
    x2 = data(rng) * 5.0  # very different scale -> different bandwidth
    ck = tmp_path / "bw2"
    m = VGAN_no_kl(batch_size=32, epochs=4, verbose=False,
                   checkpoint_dir=ck, checkpoint_every=2)
    m.fit(x1)
    bw1 = m.bandwidth
    m.fit(x2)
    m2 = VGAN_no_kl(batch_size=32, verbose=False).restore_checkpoint(ck)
    assert m2.bandwidth != bw1
    np.testing.assert_allclose(m2.bandwidth, m.bandwidth, rtol=1e-6)


def test_checkpoint_atomic_pointer_and_legacy_layout(tmp_path, rng):
    """Crash-safety: an interrupted save (dir created, pointer not flipped)
    must leave the previous checkpoint fully readable; pre-round-3 flat
    layouts still restore."""
    import shutil

    import jax as _jax

    from vgan_tpu.train.steps import TrainConfig, init_no_kl_state
    from vgan_tpu.utils.checkpoint import (
        load_meta,
        restore_train_state,
        save_train_state,
    )

    config = TrainConfig(ndims=8, batch_size=4)
    state = init_no_kl_state(config, _jax.random.PRNGKey(0))
    p = tmp_path / "atomic"
    save_train_state(p, state, {"tag": 1})

    # simulate a crash mid-save: a new dir exists but LATEST never flipped
    (p / "ckpt_99").mkdir()
    assert load_meta(p)["tag"] == 1
    restored = restore_train_state(p, state)
    np.testing.assert_array_equal(
        np.asarray(restored.key), np.asarray(state.key)
    )

    # legacy (flat) layout: state/ + meta.json directly under the path
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    shutil.move(str(p / "ckpt_0" / "state"), str(legacy / "state"))
    shutil.move(str(p / "ckpt_0" / "meta.json"), str(legacy / "meta.json"))
    assert load_meta(legacy)["tag"] == 1
    restore_train_state(legacy, state)


def test_bf16_opt_state_checkpoint_roundtrip(tmp_path, rng):
    """opt_state_dtype='bfloat16' state survives checkpoint/resume
    bit-exactly (orbax round-trips bf16 leaves; resume continues the same
    trajectory as an uninterrupted run)."""
    import jax
    import jax.numpy as jnp

    x = data(rng)
    kw = dict(batch_size=32, verbose=False, opt_state_dtype="bfloat16",
              model_matmul_dtype="bfloat16")

    m_full = VGAN_no_kl(epochs=6, **kw)
    m_full.fit(x)

    m_a = VGAN_no_kl(epochs=3, **kw)
    m_a.fit(x)
    leaf = jax.tree.leaves(m_a.train_state.opt_state.square_avg)[0]
    assert leaf.dtype == jnp.bfloat16
    m_a.save_checkpoint(tmp_path / "ckpt")

    m_b = VGAN_no_kl(epochs=3, **kw)
    m_b.restore_checkpoint(tmp_path / "ckpt")
    leaf_b = jax.tree.leaves(m_b.train_state.opt_state.square_avg)[0]
    assert leaf_b.dtype == jnp.bfloat16
    m_b.continue_fit(x, 3)

    np.testing.assert_allclose(
        m_b.train_history["generator_loss"],
        m_full.train_history["generator_loss"],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        m_b.generate_subspaces(16), m_full.generate_subspaces(16)
    )
