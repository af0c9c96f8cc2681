"""Wall-clock timing + TPS metering (reference ``Tic``, phi.py:16-24)."""

from __future__ import annotations

import time


class Tic:
    def __init__(self):
        self.last_time = time.perf_counter()

    def __call__(self) -> float:
        now = time.perf_counter()
        elapsed = now - self.last_time
        self.last_time = now
        return elapsed
