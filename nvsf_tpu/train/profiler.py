"""Tracing / profiling helpers (SURVEY §5: the reference has none — only a
wall-clock print; here: jax.profiler traces + per-phase timers)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


class PhaseTimers:
    """Accumulating per-phase wall-clock timers.

    with timers.phase("render"): ...
    print(timers.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"  {name:24s} {t:8.3f}s  ({n}x, "
                         f"{t / max(n, 1) * 1e3:7.2f} ms/it)")
        return "\n".join(lines)

    def clear(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (viewable in TensorBoard / xprof); no-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation scope for host-side phases inside a device trace."""
    return jax.profiler.TraceAnnotation(name)
