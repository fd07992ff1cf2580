"""Tracing / profiling as a first-class (thin) subsystem.

The reference has no profiler — only wall-clock prints around epochs and the
dataset build (SURVEY §5.1). Here:

- ``trace(dir)``: context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard/Perfetto (device timelines, HLO cost);
- ``StepTimer``: cheap wall-clock histogram of a named hot loop (per-step
  p50/p90/max) that serializes to the structured run log;
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` passthrough for
  labeling host-side phases inside a trace.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profile into ``log_dir`` (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock stats for a named hot loop.

    Usage::

        timer = StepTimer("train_step")
        for batch in feeder:
            with timer:
                run(batch)
        stats = timer.summary()   # {count, mean_ms, p50_ms, p90_ms, max_ms}
    """

    def __init__(self, name: str, capacity: int = 100_000) -> None:
        self.name = name
        self.capacity = capacity
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        if len(self._times) < self.capacity:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"name": self.name, "count": 0}
        ts = sorted(self._times)
        n = len(ts)

        def pct(p: float) -> float:
            return ts[min(n - 1, int(p * n))] * 1000.0

        return {
            "name": self.name,
            "count": n,
            "mean_ms": sum(ts) / n * 1000.0,
            "p50_ms": pct(0.50),
            "p90_ms": pct(0.90),
            "max_ms": ts[-1] * 1000.0,
        }

    def dump(self, path: str) -> None:
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(self.summary()) + "\n")
