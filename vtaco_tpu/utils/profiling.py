"""Tracing / profiling / debugging hooks.

The reference had only ad-hoc ``time.time()`` prints (train.py:178,200).
Here profiling is a first-class subsystem:

  * ``trace(...)`` — context manager around jax.profiler; writes a
    TensorBoard/Perfetto trace directory.
  * ``StepTimer`` — wall-clock + steps/sec accounting for the train loop.
  * ``debug_nans(...)`` — toggles jax's NaN checker (the purity-respecting
    answer to race/sanitizer tooling; SURVEY.md §5).
  * ``annotate(name)`` — TraceAnnotation for named regions inside steps.

Config surface (training section):
  profile_dir: <path>      enable a jax.profiler trace for steps 10..20
  debug_nans: true         enable jax_debug_nans
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (TensorBoard `profile` plugin / Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in traces."""
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Rolling steps/sec + wall-clock accounting for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.t0 = time.time()
        self.stamps = []

    def tick(self):
        now = time.time()
        self.stamps.append(now)
        if len(self.stamps) > self.window:
            self.stamps.pop(0)

    @property
    def steps_per_sec(self):
        if len(self.stamps) < 2:
            return 0.0
        return (len(self.stamps) - 1) / (self.stamps[-1] - self.stamps[0])

    @property
    def elapsed(self):
        return time.time() - self.t0


class ProfiledRegion:
    """Train-loop integration: starts a trace at `start_step`, stops at
    `stop_step`, no-ops otherwise."""

    def __init__(self, log_dir, start_step=10, stop_step=20):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def maybe_start(self, step):
        # >= (not ==): callers that advance multiple steps per dispatch
        # (fused mode) may never land exactly on start_step
        if self.log_dir and not self._active and step >= self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.log_dir}")
