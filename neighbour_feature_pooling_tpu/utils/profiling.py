"""Profiling hooks: ``jax.profiler`` trace capture + step timing.

The reference has no profiling beyond ``torchinfo.summary`` (SURVEY §5.1);
this is the TPU-native upgrade: XLA profiler traces viewable in
TensorBoard/Perfetto plus a lightweight step timer for throughput reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax

__all__ = ["trace", "Timer", "benchmark_fn"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock step timer with warm-up skipping."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def benchmark_fn(fn: Callable, *args, iters: int = 50, warmup: int = 5
                 ) -> float:
    """Mean seconds/call of a jitted function (device-synchronized)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
