"""Adadelta with exact PyTorch update semantics, as a functional transform.

The reference trains every network with ``torch.optim.Adadelta(lr,
weight_decay)`` (vgan.py:207-210, 567-568; rho/eps left at torch defaults
0.9 / 1e-6; the constructor's ``momentum`` hyperparameter is stored but never
passed to the optimizer — replicated at the estimator layer by simply not
using it). Optax's ``adadelta`` differs from torch in weight-decay coupling,
so loss-curve fidelity requires this exact formulation (torch algorithm, per
its documented update rule):

    g      <- grad + weight_decay * param          (L2-coupled, not decoupled)
    E[g^2] <- rho * E[g^2] + (1 - rho) * g^2
    delta  <- sqrt(E[dx^2] + eps) / sqrt(E[g^2] + eps) * g
    E[dx^2]<- rho * E[dx^2] + (1 - rho) * delta^2
    param  <- param - lr * delta

Param freezing: torch skips parameters whose ``grad`` is None entirely — no
update, no weight decay, no state advance. ``update(..., active=mask)``
reproduces that: masked-out leaves get a zero update and an unchanged state.
The mask may be a traced boolean (per-leaf), so phase-dependent freezing (the
reference's encoder-freeze quirk, vgan.py:266-267/319-320) stays inside one
compiled graph.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdadeltaState(NamedTuple):
    square_avg: Any
    acc_delta: Any


def adadelta(
    learning_rate: float,
    rho: float = 0.9,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    state_dtype: "str | None" = None,
) -> optax.GradientTransformation:
    """Torch-parity Adadelta as an ``optax.GradientTransformation``.

    ``update(grads, state, params, active=mask)`` — ``params`` is required
    (weight decay); ``active`` is an optional pytree of booleans (prefix
    broadcastable per-leaf) marking which leaves take a step this call.

    ``state_dtype='bfloat16'`` stores ``square_avg``/``acc_delta`` in bf16
    (the math stays f32): at large d the fit is bounded by optimizer-state
    HBM traffic (docs/KERNELS.md "Stress-fit roofline"), and halving the
    state bytes trades ~1e-2 relative step-size noise — the EMAs are
    smooth statistics, not accumulators — for bandwidth. Opt-in.
    """
    sdt = jnp.dtype(state_dtype) if state_dtype is not None else None

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=sdt or p.dtype)
        return AdadeltaState(
            square_avg=jax.tree.map(zeros, params),
            acc_delta=jax.tree.map(zeros, params),
        )

    def update_fn(grads, state, params=None, *, active=None):
        if params is None:
            raise ValueError("adadelta requires params (weight_decay coupling)")
        if active is None:
            active = jax.tree.map(lambda _: True, grads)

        def leaf(g, sq, acc, p, a):
            a = jnp.asarray(a, dtype=bool)
            # math in the (master) param dtype; only STORAGE may be lower
            # precision (state_dtype)
            sqm = sq.astype(p.dtype)
            accm = acc.astype(p.dtype)
            g = g + weight_decay * p
            new_sq = rho * sqm + (1.0 - rho) * g * g
            delta = g * jnp.sqrt(accm + eps) / jnp.sqrt(new_sq + eps)
            new_acc = rho * accm + (1.0 - rho) * delta * delta
            upd = -learning_rate * delta
            return (
                jnp.where(a, upd, 0.0),
                jnp.where(a, new_sq, sqm).astype(sq.dtype),
                jnp.where(a, new_acc, accm).astype(acc.dtype),
            )

        out = jax.tree.map(
            leaf, grads, state.square_avg, state.acc_delta, params, active
        )
        updates = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        new_sq = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        new_acc = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return updates, AdadeltaState(square_avg=new_sq, acc_delta=new_acc)

    return optax.GradientTransformation(init_fn, update_fn)
