"""Profiling: jax.profiler traces and honest per-step timing.

The reference's only instrumentation is wall-clock deltas per N iters
(scripts/onoff.py:376,384-386, onofftf/utils.py:4-8). TPU equivalents:
``trace()`` captures a profiler trace viewable in TensorBoard/Perfetto, and
``time_fn`` measures a jitted callable with ``block_until_ready`` so device
async execution can't hide behind dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 50) -> Tuple[float, object]:
    """(seconds per call, last result) for a jitted fn, excluding compile."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


class StepTimer:
    """Rolling steps/sec with compile-step exclusion — drop-in for training
    loops that want reference-style periodic timing logs."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def tick(self, result=None):
        if self.t0 is None:
            if result is not None:
                jax.block_until_ready(result)
            self.t0 = time.time()
            return 0.0
        self.steps += 1
        return self.steps / (time.time() - self.t0)
