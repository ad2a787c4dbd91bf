"""Profiling hooks: named trace annotations + Perfetto trace capture.

The reference has no tracing (tqdm bars only, vgan.py:253/295/597). Here the
hot regions (epoch scans, the Gram kernel dispatch, sampling) can be wrapped
in ``jax.profiler`` annotations, and a whole run captured to a Perfetto
trace directory for xprof/perfetto.dev inspection.
"""

from __future__ import annotations

import contextlib
import functools

import jax


def annotate(name: str):
    """Decorator: wrap a function in a named TraceAnnotation."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


@contextlib.contextmanager
def trace_context(log_dir: str):
    """Capture a device+host trace (Perfetto/xprof) for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
