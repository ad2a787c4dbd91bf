"""Subspace generator MLPs.

Behavioral spec: /root/reference/src/models/Generator.py:43-70.

``GeneratorBig`` maps latent noise z (L,) through a *purely linear* MLP
L -> 2L -> 4L -> 8L -> d (there are deliberately no nonlinearities between
the Dense layers in the reference) terminated by the upper-softmax
activation, yielding a soft-binary subspace-membership row. The latent size
used by the estimators is ``L = max(d // 16, 1)`` (vgan.py:196).

``Generator`` is the square L -> L x4 variant the reference defines but never
instantiates; kept for API-surface parity.

TPU notes: the whole forward is 4 small matmuls + a softmax — it exists to be
called inside the jitted train step / vmapped sampling path, where XLA fuses
it with the projection and MMD. For very large d the final 8L x d Dense can
be sharded on the feature axis (see vgan_tpu.parallel).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from vgan_tpu.models.initializers import REFERENCE_NORMAL, dense_inits
from vgan_tpu.ops.activations import (
    gumbel_upper_softmax,
    st_upper_softmax,
    upper_softmax,
)


class GeneratorBig(nn.Module):
    """Latent L -> 2L -> 4L -> 8L -> d linear MLP + upper-softmax.

    ``compute_dtype='bfloat16'`` runs the Dense matmuls with bf16 operands
    (params stay f32 masters; XLA accumulates in f32 on the MXU) — the
    stress-regime option (docs/KERNELS.md roofline). The pre-softmax
    logits are cast back to f32: at d ~ 10^4 the softmax mass per
    coordinate is ~1e-4, below bf16's resolution near the 1/d threshold.

    ``activation`` selects the terminal binarization's GRADIENT estimator
    (opt-in extensions; the reference-parity default is 'upper_softmax',
    whose mask-as-constant gradient is the behavioral spec at
    Generator.py:18-22):

    - ``'upper_softmax'`` — reference-exact (zero gradient through snapped
      coordinates);
    - ``'st'`` — identical forward, straight-through softmax gradient;
    - ``'gumbel_st'`` — Gumbel-softmax relaxation with straight-through
      snapping at temperature ``gumbel_tau``; requires a ``gumbel_key``
      argument to ``__call__``.
    """

    out_features: int
    latent_size: int
    init_scheme: str = REFERENCE_NORMAL
    param_dtype: type = jax.numpy.float32
    compute_dtype: "type | None" = None
    activation: str = "upper_softmax"
    gumbel_tau: float = 1.0

    @nn.compact
    def __call__(self, z: jax.Array, gumbel_key: "jax.Array | None" = None) -> jax.Array:
        widths = [
            2 * self.latent_size,
            4 * self.latent_size,
            8 * self.latent_size,
            self.out_features,
        ]
        fan_in = self.latent_size
        h = z
        for w in widths:
            k_init, b_init = dense_inits(self.init_scheme, fan_in)
            h = nn.Dense(
                w,
                kernel_init=k_init,
                bias_init=b_init,
                param_dtype=self.param_dtype,
                dtype=self.compute_dtype,
            )(h)
            fan_in = w
        if self.compute_dtype is not None:
            # back to full precision for the softmax: at d ~ 10^4 the
            # per-coordinate mass (~1/d) is below bf16 resolution
            h = h.astype(jax.numpy.float32)
        if self.activation == "upper_softmax":
            return upper_softmax(h, axis=-1)
        if self.activation == "st":
            return st_upper_softmax(h, axis=-1)
        if self.activation == "gumbel_st":
            if gumbel_key is None:
                raise ValueError(
                    "activation='gumbel_st' requires a gumbel_key argument "
                    "(the Gumbel noise stream); inference paths should "
                    "construct the deterministic module instead"
                )
            return gumbel_upper_softmax(
                h, gumbel_key, tau=self.gumbel_tau, axis=-1
            )
        raise ValueError(f"unknown activation {self.activation!r}")


class Generator(nn.Module):
    """Square latent L -> L x4 linear MLP + upper-softmax (unused variant)."""

    latent_size: int
    init_scheme: str = REFERENCE_NORMAL
    param_dtype: type = jax.numpy.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = z
        for _ in range(4):
            k_init, b_init = dense_inits(self.init_scheme, self.latent_size)
            h = nn.Dense(
                self.latent_size,
                kernel_init=k_init,
                bias_init=b_init,
                param_dtype=self.param_dtype,
            )(h)
        return upper_softmax(h, axis=-1)


def latent_size_for(ndims: int) -> int:
    """Reference latent-size rule: ``max(d // 16, 1)`` (vgan.py:196)."""
    return max(int(ndims / 16), 1)
