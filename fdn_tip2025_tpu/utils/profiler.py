"""Profiling / step-timing observability.

The reference's observability is wall-clock iter/data time + a
commented-out GPU memory tracker (SURVEY.md §5 "tracing"). Here:
  * StepTimer — per-step iter/data timing with EMA, feeding MessageLogger
  * trace() — context manager around jax.profiler for on-demand device
    traces viewable in TensorBoard (xprof), replacing MemTracker.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace: with trace('/tmp/prof'): step()."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, momentum=0.98):
        self.m = momentum
        self.iter_ema = None
        self.data_ema = None
        self._t = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        dt = now - self._t
        self.data_ema = dt if self.data_ema is None else \
            self.m * self.data_ema + (1 - self.m) * dt
        self._t = now
        return dt

    def step_done(self):
        now = time.perf_counter()
        dt = now - self._t
        self.iter_ema = dt if self.iter_ema is None else \
            self.m * self.iter_ema + (1 - self.m) * dt
        self._t = now
        return dt
