"""Subspace-selection activations.

The generator's terminal activation maps logits to a "soft-binary" row vector:
coordinates whose softmax mass reaches the uniform level 1/d are snapped to
exactly 1.0 ("selected"); the rest keep their (near-zero in high d) softmax
value. Behavioral spec: /root/reference/src/models/Generator.py:6-40.

Gradient semantics (load-bearing for loss-curve fidelity): the selection mask
is a non-differentiable constant, so snapped coordinates contribute *zero*
local gradient — logits learn only through the unselected coordinates'
softmax values, which are coupled to the selected logits through the softmax
normalizer. This is NOT a straight-through estimator; ``jnp.where`` with a
constant branch reproduces it exactly. A Gumbel/straight-through variant is
provided as an opt-in extension (not used by the reference-parity paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upper_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax with upper snapping: values >= 1/d become exactly 1.0.

    Spec: Generator.py:18-22 — ``(s < 1/d) * s + (s >= 1/d) * 1``.
    """
    d = x.shape[axis]
    s = jax.nn.softmax(x, axis=axis)
    return jnp.where(s >= 1.0 / d, jnp.ones((), dtype=s.dtype), s)


def upper_lower_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Variant: selected coords keep softmax value, unselected become 1e-8.

    Spec: Generator.py:36-40 (defined in the reference, never instantiated).
    """
    d = x.shape[axis]
    s = jax.nn.softmax(x, axis=axis)
    return jnp.where(s >= 1.0 / d, s, jnp.asarray(1e-8, dtype=s.dtype))


def binarize_mask(u: jax.Array, axis: int = -1) -> jax.Array:
    """Hard subspace mask: ``u >= 1/d`` (bool).

    Spec: vgan.py:369 — inference-time binarization of generator outputs.
    """
    d = u.shape[axis]
    return u >= 1.0 / d


def st_upper_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Straight-through upper-softmax (extension; opt-in).

    Forward is IDENTICAL to :func:`upper_softmax` (selected coords snap to
    exactly 1.0), but the backward pass is the gradient of the plain softmax
    everywhere — gradients flow through the selected coordinates instead of
    being zeroed by the constant snap. This isolates the reference's
    crippled gradient estimator (Generator.py:18-22 treats the selection
    mask as a constant) from the selection geometry: same forward
    distribution, working gradients. Not used by reference-parity paths;
    enable via ``TrainConfig(generator_grad='st')``.
    """
    d = x.shape[axis]
    s = jax.nn.softmax(x, axis=axis)
    forward = jnp.where(s >= 1.0 / d, jnp.ones((), dtype=s.dtype), s)
    return jax.lax.stop_gradient(forward - s) + s


def gumbel_upper_softmax(
    x: jax.Array,
    key: jax.Array,
    tau: float = 1.0,
    axis: int = -1,
    hard: bool = True,
) -> jax.Array:
    """Gumbel-softmax relaxation of the upper-softmax selection (extension).

    Opt-in alternative binarization with non-zero gradients through selected
    coordinates (straight-through). Not used by the reference-parity training
    paths; offered for experimentation per the north-star spec.
    """
    g = jax.random.gumbel(key, x.shape, dtype=x.dtype)
    s = jax.nn.softmax((x + g) / tau, axis=axis)
    if not hard:
        return s
    d = x.shape[axis]
    # Straight-through: forward snaps selected coords to 1.0, backward is the
    # gradient of the soft relaxation everywhere.
    forward = jnp.where(s >= 1.0 / d, jnp.ones((), dtype=s.dtype), s)
    return jax.lax.stop_gradient(forward - s) + s
