"""Tracing / debugging hooks (SURVEY.md §5: the reference has only a
wall-clock Timer; the TPU rebuild exposes jax.profiler traces + NaN checks)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device profile (view with TensorBoard's profile plugin or
    xprof): ``with profile_trace('log/run/profile'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True):
    """Trap NaNs at op granularity (the jax analog of the reference's
    torch.autograd.set_detect_anomaly, reference show_rainbow2.py:55)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Per-step wall-clock accounting with device sync."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)
