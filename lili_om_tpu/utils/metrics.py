"""Observability: per-stage timing aggregation, throughput counters, and
optional ``jax.profiler`` traces.

The reference's tracing is a hand-rolled ``Timer`` with commented-out
printouts (LiLi-OM/include/utils/timer.h; SURVEY.md §5). Here every pipeline
stage records into a shared registry; ``report()`` gives p50/p95/mean and
the scans/sec north-star counter.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import numpy as np


class StageMetrics:
    """Per-stage wall-time registry + throughput counter."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self._t_first: float | None = None
        self._n_scans = 0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def count_scan(self):
        if self._t_first is None:
            self._t_first = time.perf_counter()
        self._n_scans += 1

    @property
    def scans_per_sec(self) -> float:
        if self._t_first is None or self._n_scans < 2:
            return 0.0
        return (self._n_scans - 1) / max(time.perf_counter() - self._t_first, 1e-9)

    def report(self) -> Dict[str, dict]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(a),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "total_s": float(a.sum()),
            }
        if self._n_scans:
            out["_throughput"] = {"scans": self._n_scans,
                                  "scans_per_sec": self.scans_per_sec}
        return out

    def pretty(self) -> str:
        lines = []
        for name, st in sorted(self.report().items()):
            if name == "_throughput":
                lines.append(f"throughput: {st['scans_per_sec']:.1f} scans/s "
                             f"({st['scans']} scans)")
            else:
                lines.append(f"{name:24s} n={st['n']:<5d} mean={st['mean_ms']:7.2f} ms "
                             f"p50={st['p50_ms']:7.2f} p95={st['p95_ms']:7.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — view with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
