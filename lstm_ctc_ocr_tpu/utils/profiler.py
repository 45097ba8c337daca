"""Profiling: jax.profiler trace capture around a window of train steps.

The reference's only profiling is the Fast-R-CNN wall-clock Timer printed
with the loss (/root/reference/lib/lstm/train.py:133-138); the TPU-native
rebuild adds a real device trace: set ``cfg.PROFILE_DIR`` (or pass
``--set PROFILE_DIR '"logs/profile"'``) and steps
[``PROFILE_START``, ``PROFILE_START + PROFILE_STEPS``) are captured with
``jax.profiler`` into a TensorBoard-readable trace (XLA ops, Pallas
kernels, HBM transfers, per-step timeline).

Usage in a loop::

    prof = StepProfiler()          # no-op unless cfg.PROFILE_DIR is set
    for it in ...:
        prof.step(it)              # starts/stops the trace at the window
    prof.close()                   # safety stop on early exit
"""

from __future__ import annotations

import os

from ..config import cfg


class StepProfiler:
    """Captures a ``jax.profiler`` trace for a window of steps."""

    def __init__(self, trace_dir=None, start=None, num_steps=None):
        self.trace_dir = trace_dir if trace_dir is not None else str(
            cfg.PROFILE_DIR)
        self.start = int(start if start is not None else cfg.PROFILE_START)
        self.num_steps = int(num_steps if num_steps is not None
                             else cfg.PROFILE_STEPS)
        self.active = False
        self.done = False

    @property
    def enabled(self) -> bool:
        return bool(self.trace_dir)

    def step(self, it: int) -> None:
        """Call once per train iteration with the iteration number."""
        if not self.enabled or self.done:
            return
        if not self.active and self.start <= it < self.start + self.num_steps:
            import jax
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self.active = True
            print('profiler: tracing steps [{}, {}) -> {}'.format(
                it, self.start + self.num_steps, self.trace_dir), flush=True)
        elif self.active and it >= self.start + self.num_steps:
            self._stop()

    def _stop(self) -> None:
        import jax
        jax.profiler.stop_trace()
        self.active = False
        self.done = True
        print('profiler: trace written to {}'.format(self.trace_dir),
              flush=True)

    def close(self) -> None:
        if self.active:
            self._stop()
