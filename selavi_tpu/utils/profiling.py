"""Structured tracing / profiling hooks.

The reference has only wall-clock meters (SURVEY.md §5.1). TPU-native
upgrade: jax.profiler trace capture around training windows, viewable in
TensorBoard/Perfetto, plus named step annotations so device timelines line
up with loop iterations.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_window(dump_path: str, enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed block into
    ``{dump_path}/profile`` (TensorBoard 'profile' plugin format)."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(dump_path, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(trace_dir)
        started = True
    except Exception as e:  # profiling may be unsupported on some runtimes
        logger.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", trace_dir)
            except Exception as e:
                logger.warning("profiler stop failed: %s", e)


def step_annotation(name: str):
    """Named annotation that shows up on the device timeline."""
    return jax.profiler.StepTraceAnnotation(name)


class Stopwatch:
    """Cheap scoped host timer for phase-level logging."""

    def __init__(self, label: str, log=logger.info):
        self.label = label
        self.log = log

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.log("%s took %.3fs", self.label, time.perf_counter() - self.t0)
