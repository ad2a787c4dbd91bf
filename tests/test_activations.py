"""upper_softmax forward + gradient parity against the PyTorch reference math.

The torch oracle here re-expresses the documented formula
``(s < 1/d) * s + (s >= 1/d) * 1`` (Generator.py:18-22) — gradient semantics
(mask as constant, zero grad through snapped coords) must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgan_tpu.ops.activations import (
    binarize_mask,
    gumbel_upper_softmax,
    st_upper_softmax,
    upper_lower_softmax,
    upper_softmax,
)


def torch_upper_softmax(x):
    s = torch.nn.functional.softmax(x, 1)
    return torch.less(s, 1 / s.shape[1]) * s + torch.greater_equal(s, 1 / s.shape[1])


def torch_upper_lower_softmax(x):
    s = torch.nn.functional.softmax(x, 1)
    sel = torch.greater_equal(s, 1 / s.shape[1])
    return s * sel + (~sel) * 1e-08


def test_upper_softmax_forward_matches_torch(rng):
    x = rng.normal(size=(7, 13)).astype(np.float32)
    ours = np.asarray(upper_softmax(jnp.asarray(x), axis=1))
    theirs = torch_upper_softmax(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)
    # selected coords are exactly 1.0
    assert np.all(ours[ours >= 1.0 / 13] == 1.0)


def test_upper_softmax_gradient_matches_torch(rng):
    x = rng.normal(size=(5, 11)).astype(np.float32)
    g = rng.normal(size=(5, 11)).astype(np.float32)

    def f(xx):
        return jnp.sum(upper_softmax(xx, axis=1) * jnp.asarray(g))

    ours = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = torch.tensor(x, requires_grad=True)
    torch.sum(torch_upper_softmax(xt) * torch.tensor(g)).backward()
    theirs = xt.grad.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_upper_softmax_zero_grad_through_snapped_coords():
    # One dominant logit -> snapped to 1.0; cotangent on that coord alone must
    # produce zero gradient (mask is a constant, not straight-through).
    x = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    out = upper_softmax(x, axis=1)
    assert out[0, 0] == 1.0

    def f(xx):
        return upper_softmax(xx, axis=1)[0, 0]

    grad = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=0)


def test_upper_lower_softmax_matches_torch(rng):
    x = rng.normal(size=(4, 9)).astype(np.float32)
    ours = np.asarray(upper_lower_softmax(jnp.asarray(x), axis=1))
    theirs = torch_upper_lower_softmax(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)


def test_binarize_mask(rng):
    u = rng.uniform(size=(6, 10)).astype(np.float32)
    mask = np.asarray(binarize_mask(jnp.asarray(u), axis=1))
    np.testing.assert_array_equal(mask, u >= 0.1)
    assert mask.dtype == bool


def test_st_upper_softmax_forward_identical_backward_softmax(rng):
    # Forward: bit-identical to upper_softmax. Backward: the plain softmax
    # jacobian everywhere (gradient FLOWS through snapped coords) — the
    # de-confounding estimator for the geometry-vs-optimization ablation.
    x = rng.normal(size=(5, 11)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(st_upper_softmax(jnp.asarray(x), axis=1)),
        np.asarray(upper_softmax(jnp.asarray(x), axis=1)),
    )
    g = rng.normal(size=(5, 11)).astype(np.float32)

    def f(xx):
        return jnp.sum(st_upper_softmax(xx, axis=1) * jnp.asarray(g))

    def f_soft(xx):
        return jnp.sum(jax.nn.softmax(xx, axis=1) * jnp.asarray(g))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(jnp.asarray(x))),
        np.asarray(jax.grad(f_soft)(jnp.asarray(x))),
        rtol=1e-6, atol=1e-7,
    )
    # and specifically: nonzero grad through a snapped coordinate
    xs = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    grad = jax.grad(lambda xx: st_upper_softmax(xx, axis=1)[0, 0])(xs)
    assert np.any(np.asarray(grad) != 0.0)


def test_gumbel_upper_softmax_straight_through():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((3, 8))
    out = np.asarray(gumbel_upper_softmax(x, key, hard=True))
    # forward values are snapped (to 1.0 up to straight-through fp eps)
    assert np.all(np.isclose(out, 1.0, atol=1e-6) | (out < 1.0 / 8))

    # backward: gradient flows everywhere (unlike upper_softmax)
    def f(xx):
        return jnp.sum(gumbel_upper_softmax(xx, key, hard=True) ** 2)

    grad = jax.grad(f)(x)
    assert np.any(np.asarray(grad) != 0.0)
