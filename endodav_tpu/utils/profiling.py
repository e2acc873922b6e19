"""Tracing / profiling utilities.

The reference has no tracing — only wall-clock prints (SURVEY.md §5).
Here: `jax.profiler` trace capture around any code region (viewable in
TensorBoard / Perfetto), plus a lightweight stage timer with device
synchronization for honest per-stage wall-clock accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage timer; `sync=True` blocks on device work so
    stage attribution is not skewed by async dispatch."""

    def __init__(self, sync: bool = True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            jax.block_until_ready(jax.numpy.zeros(()))
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.block_until_ready(jax.numpy.zeros(()))
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            mean_ms = self.totals[name] / max(self.counts[name], 1) * 1000
            lines.append(f"{name}: total {self.totals[name]:.2f}s | mean {mean_ms:.1f}ms x{self.counts[name]}")
        return "\n".join(lines)
