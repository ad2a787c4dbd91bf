"""Adadelta parity with torch.optim.Adadelta, including weight-decay coupling
and the frozen-param (grad=None) skip semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgan_tpu.train.adadelta import adadelta


def test_adadelta_matches_torch_multi_step(rng):
    w0 = rng.normal(size=(4, 3))
    lr, wd = 0.007, 0.04

    # torch side
    wt = torch.tensor(w0, requires_grad=True)
    opt_t = torch.optim.Adadelta([wt], lr=lr, weight_decay=wd)

    # ours
    params = {"w": jnp.asarray(w0)}
    opt = adadelta(lr, weight_decay=wd)
    state = opt.init(params)

    for step in range(5):
        g = rng.normal(size=(4, 3))
        opt_t.zero_grad()
        wt.grad = torch.tensor(g)
        opt_t.step()

        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-10, atol=1e-12
        )


def test_adadelta_default_hypers_match_torch(rng):
    # rho=0.9, eps=1e-6 are the torch defaults the reference relies on
    w0 = rng.normal(size=(6,))
    wt = torch.tensor(w0, requires_grad=True)
    opt_t = torch.optim.Adadelta([wt], lr=1.0)

    params = {"w": jnp.asarray(w0)}
    opt = adadelta(1.0)
    state = opt.init(params)

    g = rng.normal(size=(6,))
    wt.grad = torch.tensor(g)
    opt_t.step()
    updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-12
    )


def test_adadelta_frozen_leaf_untouched(rng):
    """A masked-out leaf must keep its value AND its optimizer state, exactly
    like a torch param whose grad is None."""
    params = {"a": jnp.asarray(rng.normal(size=(3,))),
              "b": jnp.asarray(rng.normal(size=(3,)))}
    opt = adadelta(0.5, weight_decay=0.04)
    state = opt.init(params)

    grads = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    active = {"a": True, "b": False}

    updates, new_state = opt.update(grads, state, params, active=active)
    assert np.all(np.asarray(updates["a"]) != 0.0)
    assert np.all(np.asarray(updates["b"]) == 0.0)
    assert np.all(np.asarray(new_state.square_avg["b"]) == 0.0)
    assert np.any(np.asarray(new_state.square_avg["a"]) != 0.0)


def test_adadelta_traced_mask(rng):
    """Mask may be a traced bool (phase-dependent freezing inside jit)."""
    params = {"a": jnp.ones((2,))}
    opt = adadelta(0.1)
    state = opt.init(params)

    @jax.jit
    def step(flag, params, state):
        updates, state = opt.update(
            {"a": jnp.ones((2,))}, state, params, active={"a": flag}
        )
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    p_on, _ = step(jnp.asarray(True), params, state)
    p_off, _ = step(jnp.asarray(False), params, state)
    assert np.all(np.asarray(p_on["a"]) != 1.0)
    assert np.all(np.asarray(p_off["a"]) == 1.0)
