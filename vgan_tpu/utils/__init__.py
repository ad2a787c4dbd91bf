"""Utilities: checkpoint/resume, structured metrics, profiling hooks."""

from vgan_tpu.utils.checkpoint import save_train_state, restore_train_state
from vgan_tpu.utils.metrics import MetricsLogger
from vgan_tpu.utils.profiling import annotate, trace_context

__all__ = [
    "save_train_state",
    "restore_train_state",
    "MetricsLogger",
    "annotate",
    "trace_context",
]
