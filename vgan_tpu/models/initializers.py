"""Weight initializers matching the reference's two init regimes.

- ``reference_normal``: W ~ N(0, 0.1), b = 0 — the ``__weights_init`` hook the
  kernel-learning ``VGAN.fit`` applies to every Linear layer
  (/root/reference/src/vgan.py:69-78, applied at vgan.py:204-205).
- ``torch_default``: PyTorch's stock ``nn.Linear`` init — W and b both
  ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)) (kaiming_uniform(a=sqrt(5)) reduces to
  this bound). ``VGAN_no_kl.fit`` never applies ``__weights_init``
  (vgan.py:565-566), so its nets train from this default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

REFERENCE_NORMAL = "reference_normal"
TORCH_DEFAULT = "torch_default"


def reference_normal_kernel_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * jnp.asarray(0.1, dtype)


def zeros_bias_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    # flax kernel shape is (fan_in, fan_out)
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_default_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def dense_inits(scheme: str, fan_in: int):
    """Return ``(kernel_init, bias_init)`` for the given scheme."""
    if scheme == REFERENCE_NORMAL:
        return reference_normal_kernel_init, zeros_bias_init
    if scheme == TORCH_DEFAULT:
        return torch_default_kernel_init, make_torch_default_bias_init(fan_in)
    raise ValueError(f"unknown init scheme: {scheme!r}")
