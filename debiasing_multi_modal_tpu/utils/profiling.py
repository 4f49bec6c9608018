"""Profiling hooks (aux subsystem — SURVEY.md §5.1: the reference has only
AverageMeter timing; the TPU equivalent is a jax.profiler trace plus step
meters)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture a device trace viewable in TensorBoard / xprof.

    >>> with trace("/tmp/tb"):
    ...     run_epoch(...)
    """
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
