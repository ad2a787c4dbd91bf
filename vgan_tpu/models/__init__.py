"""Flax model definitions: subspace generators and the adversarial detector."""

from vgan_tpu.models.generator import Generator, GeneratorBig
from vgan_tpu.models.detector import Encoder, Decoder, Detector
from vgan_tpu.models.torch_import import (
    load_torch_generator_params,
    generator_params_from_torch_state_dict,
)

__all__ = [
    "Generator",
    "GeneratorBig",
    "Encoder",
    "Decoder",
    "Detector",
    "load_torch_generator_params",
    "generator_params_from_torch_state_dict",
]
