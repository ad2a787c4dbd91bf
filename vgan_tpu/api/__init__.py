"""Estimator API layer: reference-parity VGAN / VGAN_no_kl classes."""

from vgan_tpu.api.vgan import VGAN, VGAN_no_kl

__all__ = ["VGAN", "VGAN_no_kl"]
