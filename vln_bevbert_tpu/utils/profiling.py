"""Profiling / tracing hooks.

The reference has only TensorBoard throughput counters and a commented-out
line_profiler (SURVEY.md section 5). TPU-native observability:

- ``trace`` context manager around jax.profiler (view in TensorBoard /
  Perfetto);
- ``StepTimer``: wall-clock per-step timing with device sync, plus an
  examples/sec meter matching the reference's train_r2r.py:315-333 hook;
- ``annotate``: named TraceAnnotation for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Windowed steps/sec + examples/sec with an optional device sync."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0
        self._examples = 0
        self.steps_per_sec = float("nan")
        self.examples_per_sec = float("nan")

    def tick(self, n_examples: int = 0, sync: Optional[object] = None):
        if sync is not None:
            jax.block_until_ready(sync)
        self._steps += 1
        self._examples += n_examples
        if self._steps >= self.window:
            dt = time.time() - self._t0
            self.steps_per_sec = self._steps / dt
            self.examples_per_sec = self._examples / dt
            self._t0 = time.time()
            self._steps = 0
            self._examples = 0
            return True
        return False
