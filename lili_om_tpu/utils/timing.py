"""Host-side wall-clock timers (tic/toc, ms) + per-stage accumulators.

TPU-native replacement for the reference's hand-rolled ``Timer``
(LiLi-OM/include/utils/timer.h:10-39), extended with accumulation and a
scans/sec counter — the north-star throughput metric.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class Timer:
    """tic/toc in milliseconds (timer.h semantics)."""

    def __init__(self):
        self.tic()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


class StageTimers:
    """Accumulated per-stage wall-clock, for pipeline profiling."""

    def __init__(self):
        self.total_ms = defaultdict(float)
        self.count = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.total_ms[name] += dt
            self.count[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_ms": self.total_ms[name],
                "count": self.count[name],
                "mean_ms": self.total_ms[name] / max(self.count[name], 1),
            }
            for name in self.total_ms
        }
