"""Profiling and phase-timing utilities.

The reference has no tracing (SURVEY §5: tqdm + print only).  Here:
`jax.profiler` trace capture for TPU timelines and a lightweight phase
timer for the host pipeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-time per named phase; print with summary()."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:>24}: {total:8.3f}s total, {total / n:7.3f}s/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard-viewable) when log_dir is
    set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, iters: int = 3, warmup: int = 1):
    """Median steady-state wall time of a jitted callable."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
