"""Profiling / observability helpers.

The reference's observability is solver stats + loss callbacks (SURVEY.md §5).
TPU-native additions: ``jax.profiler`` trace capture (view in TensorBoard /
Perfetto), wall-clock step timing, and NFE accounting (every ``inference``
already returns the dynamics-evaluation count the way SciML exposes
``sol.stats``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: ``with profiling.trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter with compile-step exclusion.

    >>> timer = StepTimer(batch=4096)
    >>> for i in range(n):
    ...     out = step(...)
    ...     timer.tick(out)   # blocks on `out`, starts timing after step 0
    >>> timer.samples_per_sec
    """

    def __init__(self, batch: int) -> None:
        self.batch = batch
        self.steps = 0
        self._t0: Optional[float] = None

    def tick(self, out=None) -> None:
        if out is not None:
            jax.block_until_ready(out)
        if self._t0 is None:
            self._t0 = time.perf_counter()  # first tick = end of compile step
        else:
            self.steps += 1

    @property
    def seconds_per_step(self) -> float:
        if not self.steps or self._t0 is None:
            return float("nan")
        return (time.perf_counter() - self._t0) / self.steps

    @property
    def samples_per_sec(self) -> float:
        return self.batch / self.seconds_per_step
