"""Training core: torch-parity Adadelta, train state, jitted epoch steps."""

from vgan_tpu.train.adadelta import adadelta, AdadeltaState
from vgan_tpu.train.steps import (
    TrainConfig,
    KLTrainState,
    NoKLTrainState,
    init_no_kl_state,
    init_kl_state,
    no_kl_epoch,
    no_kl_fit_program,
    kl_detector_epoch,
    kl_generator_epoch,
    kl_fit_program,
    AlternationSchedule,
)

__all__ = [
    "adadelta",
    "AdadeltaState",
    "TrainConfig",
    "KLTrainState",
    "NoKLTrainState",
    "init_no_kl_state",
    "init_kl_state",
    "no_kl_epoch",
    "no_kl_fit_program",
    "kl_detector_epoch",
    "kl_generator_epoch",
    "kl_fit_program",
    "AlternationSchedule",
]
