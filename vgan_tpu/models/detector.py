"""Adversarial detector: encoder/decoder pair for kernel learning.

Behavioral spec: /root/reference/src/models/Detector.py.

``Encoder`` maps d -> 8L -> 4L -> 2L -> L, ``Decoder`` maps back
L -> 2L -> 4L -> 8L -> d; both are purely linear (no activations, matching
the reference). ``Detector`` returns ``(encode(x), decode(encode(x)))`` — the
encoding feeds the MMD (learned-kernel embedding), the decoding feeds the
reconstruction regularizers in the detector loss (vgan.py:276-284).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from vgan_tpu.models.initializers import REFERENCE_NORMAL, dense_inits


class Encoder(nn.Module):
    latent_size: int
    in_features: int
    init_scheme: str = REFERENCE_NORMAL
    param_dtype: type = jax.numpy.float32
    compute_dtype: "type | None" = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        widths = [
            8 * self.latent_size,
            4 * self.latent_size,
            2 * self.latent_size,
            self.latent_size,
        ]
        fan_in = self.in_features
        h = x
        for w in widths:
            k_init, b_init = dense_inits(self.init_scheme, fan_in)
            h = nn.Dense(
                w, kernel_init=k_init, bias_init=b_init,
                param_dtype=self.param_dtype, dtype=self.compute_dtype,
            )(h)
            fan_in = w
        if self.compute_dtype is not None:
            h = h.astype(jax.numpy.float32)
        return h


class Decoder(nn.Module):
    latent_size: int
    out_features: int
    init_scheme: str = REFERENCE_NORMAL
    param_dtype: type = jax.numpy.float32
    compute_dtype: "type | None" = None

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        widths = [
            2 * self.latent_size,
            4 * self.latent_size,
            8 * self.latent_size,
            self.out_features,
        ]
        fan_in = self.latent_size
        for w in widths:
            k_init, b_init = dense_inits(self.init_scheme, fan_in)
            h = nn.Dense(
                w, kernel_init=k_init, bias_init=b_init,
                param_dtype=self.param_dtype, dtype=self.compute_dtype,
            )(h)
            fan_in = w
        if self.compute_dtype is not None:
            h = h.astype(jax.numpy.float32)
        return h


class Detector(nn.Module):
    """Encoder/decoder pair; forward returns ``(encoding, reconstruction)``."""

    latent_size: int
    in_features: int
    init_scheme: str = REFERENCE_NORMAL
    param_dtype: type = jax.numpy.float32
    compute_dtype: "type | None" = None

    def setup(self):
        self.encoder = Encoder(
            self.latent_size,
            self.in_features,
            init_scheme=self.init_scheme,
            param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype,
        )
        self.decoder = Decoder(
            self.latent_size,
            self.in_features,
            init_scheme=self.init_scheme,
            param_dtype=self.param_dtype,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, x: jax.Array):
        enc = self.encoder(x)
        dec = self.decoder(enc)
        return enc, dec
