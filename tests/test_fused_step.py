"""Fused whole-fit kernel vs the jnp building blocks, math-exact.

The fused kernel (ops/pallas/fused_no_kl.py) collapses the complete no-kl
train step into one Pallas body with a hand-written backward. These tests
replay its exact batch schedule (pre-permutation + cyclic offsets) and
noise buffer through the REAL jnp building blocks (mmd_loss_constrained
_stateful, upper-softmax generator, torch-parity adadelta via value_and_
grad) and require the per-step losses, frozen bandwidth, and final params
to match — i.e. the hand-written Gram/softmax/MLP/Adadelta backward is
checked against jax autodiff on identical inputs. Interpreter mode on CPU;
Mosaic-compiled parity runs on the chip via examples/tpu_kernel_parity
additions / bench.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vgan_tpu.models.generator import GeneratorBig
from vgan_tpu.ops import mmd as mmd_ops
from vgan_tpu.ops.pallas.fused_no_kl import (
    LP,
    _round_up,
    fused_no_kl_fit,
    fused_supported,
)
from vgan_tpu.train.adadelta import adadelta
from vgan_tpu.train.steps import TrainConfig, init_no_kl_state


def _reference_trajectory(x, params, config, epochs, perm, offsets, noise):
    """Same schedule through the jnp ops + jax.grad (the oracle)."""
    n, d = x.shape
    bs = min(config.batch_size, n)
    nb = n // bs
    gen = GeneratorBig(out_features=d, latent_size=config.latent_size)
    opt = adadelta(config.lr_g, weight_decay=config.weight_decay)
    opt_state = opt.init(params)
    x_perm = jnp.asarray(x[perm])
    bw_value = jnp.zeros(())
    bw_is_set = jnp.asarray(False)
    losses = []

    @jax.jit
    def step(params, opt_state, bw_value, bw_is_set, batch, z):
        def loss_fn(p):
            u = gen.apply(p, z)
            loss, bw = mmd_ops.mmd_loss_constrained_stateful(
                batch, u * batch, u,
                weight=config.penalty_weight,
                bw_value=bw_value, bw_is_set=bw_is_set, impl="jnp",
            )
            return loss, bw

        (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u_: p + u_, params, updates)
        return new_params, new_opt, loss, bw_used

    t = 0
    for e in range(epochs):
        for i in range(nb):
            start = (int(offsets[e]) + i * bs) % n
            idx = (start + np.arange(bs)) % n
            batch = x_perm[idx]
            z = jnp.asarray(noise[t, :bs, : config.latent_size])
            params, opt_state, loss, bw_used = step(
                params, opt_state, bw_value, bw_is_set, batch, z
            )
            bw_value, bw_is_set = bw_used, jnp.asarray(True)
            losses.append(float(loss))
            t += 1
    return params, float(bw_value), np.asarray(losses).reshape(epochs, nb)


def test_fused_fit_matches_jnp_oracle(rng):
    n, d, bs, epochs = 256, 24, 64, 3
    config = TrainConfig(ndims=d, batch_size=bs, lr_g=0.01)
    assert fused_supported(n, d, bs, config.latent_size)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x[:, 0] *= 3.0

    key = jax.random.PRNGKey(5)
    state = init_no_kl_state(config, jax.random.PRNGKey(1))
    nb = n // bs
    BSP = _round_up(bs, 64)
    noise = rng.normal(size=(epochs * nb, BSP, LP)).astype(np.float32)
    offsets = rng.integers(0, n, size=(epochs,)).astype(np.int32)

    params_f, (sq, acc), (bw_f, bw_set), losses_f, perm, offs = fused_no_kl_fit(
        x, state.params, config, epochs, key,
        noise=jnp.asarray(noise), offsets=offsets,
    )
    assert bool(bw_set)
    np.testing.assert_array_equal(offs, offsets)

    # oracle must see the same effective noise: kernel zeroes lanes >= L
    # and rows >= bs before use, and the oracle slices exactly those
    params_o, bw_o, losses_o = _reference_trajectory(
        x, state.params, config, epochs, perm, offsets, noise
    )

    np.testing.assert_allclose(float(bw_f), bw_o, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(losses_f), losses_o, rtol=5e-5, atol=1e-6
    )
    for layer in range(4):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(params_f["params"][f"Dense_{layer}"][leaf]),
                np.asarray(params_o["params"][f"Dense_{layer}"][leaf]),
                rtol=2e-4, atol=1e-6,
                err_msg=f"Dense_{layer}.{leaf}",
            )


def test_fused_supported_gates():
    assert fused_supported(2000, 10, 500, 1)
    assert not fused_supported(2000, 200, 500, 12)  # d > 128
    assert not fused_supported(2000, 10, 1500, 1)   # Gram rows > cap
    assert not fused_supported(60000, 10, 500, 1)   # dataset > VMEM budget


def test_estimator_fused_fit_impl(rng, tmp_path):
    """VGAN_no_kl(fit_impl='fused') end-to-end: fit, history, sampling,
    and the frozen bandwidth all come from the fused kernel."""
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(128, 16)).astype(np.float32)
    m = VGAN_no_kl(batch_size=64, epochs=3, lr=0.01, verbose=False,
                   fit_impl="fused")
    m.fit(x)
    assert len(m.train_history["generator_loss"]) == 3
    assert all(np.isfinite(v) for v in m.train_history["generator_loss"])
    assert m.bandwidth is not None and m.bandwidth > 0
    u = m.generate_subspaces(32)
    assert u.shape == (32, 16) and u.dtype == bool


def test_fused_fit_then_continue_fit_scan(rng):
    """State from the fused kernel (params + Adadelta accumulators + frozen
    bandwidth) feeds the scan path's continue_fit seamlessly."""
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(128, 16)).astype(np.float32)
    m = VGAN_no_kl(batch_size=64, epochs=2, lr=0.01, verbose=False,
                   fit_impl="fused")
    m.fit(x)
    bw_before = m.bandwidth
    m.continue_fit(x, epochs=2)
    assert len(m.train_history["generator_loss"]) == 4
    assert np.isfinite(m.train_history["generator_loss"][-1])
    # frozen bandwidth carried through
    assert m.bandwidth == bw_before


def test_fused_fit_small_dataset(rng):
    """Regression (round-2 review): n < round_up(bs, 64) crashed the
    wraparound copy; np.resize-based tail handles n < BSP."""
    from vgan_tpu import VGAN_no_kl

    x = rng.normal(size=(50, 16)).astype(np.float32)
    m = VGAN_no_kl(batch_size=50, epochs=2, lr=0.01, verbose=False,
                   fit_impl="fused")
    m.fit(x)
    assert np.isfinite(m.train_history["generator_loss"][-1])


def test_fused_fit_zero_epochs_is_noop(rng):
    """epochs=0 must return the initial params, not uninitialized output
    buffers (review finding: the zero-size grid skips every kernel write)."""
    n, d, bs = 128, 16, 64
    config = TrainConfig(ndims=d, batch_size=bs)
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = init_no_kl_state(config, jax.random.PRNGKey(0))
    params, (sq, acc), (bw, bw_set), losses, _, _ = fused_no_kl_fit(
        x, state.params, config, 0, jax.random.PRNGKey(1)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params, state.params,
    )
    assert losses.shape == (0, n // bs)
    assert not bool(bw_set)
    for leaf in jax.tree.leaves(sq):
        assert not np.asarray(leaf).any()
