"""Wall-clock timers (housekeeping/timer.f90).

Four buckets with EWMA averaging (timer.f90:23-52): step, dt-calc, io,
balance.  Host-side; device work is bracketed with block_until_ready by the
caller when precise kernel timing is wanted (the jax.profiler trace hooks
live in utils/profiling).
"""
from __future__ import annotations

import time

STEP, DT, IO, BALANCE = range(4)
_NAMES = ["step", "dt", "io", "balance"]


class Timers:
    def __init__(self, alpha=0.1, enabled=True):
        self.enabled = enabled
        self.alpha = alpha
        self.avg = [0.0] * 4
        self.last = [0.0] * 4
        self.total = [0.0] * 4
        self.count = [0] * 4
        self._start = [None] * 4

    def start(self, bucket: int):
        if self.enabled:
            self._start[bucket] = time.perf_counter()

    def stop(self, bucket: int):
        if not self.enabled or self._start[bucket] is None:
            return
        dt = time.perf_counter() - self._start[bucket]
        self.last[bucket] = dt
        self.total[bucket] += dt
        self.count[bucket] += 1
        # EWMA smoothing (timer.f90 timer_average)
        a = self.alpha
        self.avg[bucket] = dt if self.count[bucket] == 1 else \
            a * dt + (1 - a) * self.avg[bucket]
        self._start[bucket] = None

    def report(self) -> str:
        rows = []
        for i, name in enumerate(_NAMES):
            if self.count[i]:
                rows.append(f"{name}: total {self.total[i]:.3f}s "
                            f"avg {self.avg[i]*1e3:.2f}ms n={self.count[i]}")
        return "\n".join(rows)
