"""Profiling / tracing hooks (greenfield — the reference has none, SURVEY §5).

Thin wrappers over jax.profiler so serving and training loops can capture
device traces viewable in TensorBoard/Perfetto, plus a wall-clock section
timer that syncs the device so numbers mean what they say.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/flowhigh_trace") -> Iterator[None]:
    """Capture a device trace for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or load the .perfetto file).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a captured trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def step_annotation(name: str, step: int):
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class SectionTimer:
    """Accumulating wall-clock timer with device sync per section exit."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1e3 * v / self.counts[k]}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }
