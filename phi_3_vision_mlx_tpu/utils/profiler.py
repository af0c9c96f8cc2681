"""Profiling / tracing hooks.

The reference has wall-clock-only observability (``Tic`` + TPS prints,
SURVEY.md §5).  We keep those counters (utils/timing.py, engine TPS) and add
the idiomatic TPU equivalents: ``jax.profiler`` trace capture around any
flow, annotated named scopes, and a tiny decode-step latency recorder.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/phi3v_trace"):
    """Capture a ``jax.profiler`` trace (open in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step latency recorder for decode loops."""

    def __init__(self):
        self.samples: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "n": n,
            "mean_ms": 1e3 * sum(s) / n,
            "p50_ms": 1e3 * s[n // 2],
            "p95_ms": 1e3 * s[min(n - 1, int(n * 0.95))],
            "max_ms": 1e3 * s[-1],
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
