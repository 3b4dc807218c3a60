"""Per-stage timing statistics — the reference's Stats profiler
(reference examples/public/assets/stats.js:3-78: named ring-buffer timers
with running averages), host-side and render-free."""

from __future__ import annotations

import time
from collections import deque
from typing import Dict


class StageTimer:
    """Ring-buffer timer for one named stage."""

    def __init__(self, window: int = 30):
        self.samples = deque(maxlen=window)
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = (time.perf_counter() - self._t0) * 1e3
        self.samples.append(dt)
        self._t0 = None
        return dt

    @property
    def avg_ms(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def last_ms(self) -> float:
        return self.samples[-1] if self.samples else 0.0


class Stats:
    """Named stage registry (reference stats.js add/start/stop/update)."""

    def __init__(self, window: int = 30):
        self.window = window
        self.stages: Dict[str, StageTimer] = {}

    def add(self, name: str) -> None:
        self.stages.setdefault(name, StageTimer(self.window))

    def start(self, name: str) -> None:
        self.add(name)
        self.stages[name].start()

    def stop(self, name: str) -> float:
        return self.stages[name].stop()

    def timeit(self, name: str):
        """Context manager: ``with stats.timeit("slam"): ...``"""
        stats = self

        class _Ctx:
            def __enter__(self):
                stats.start(name)

            def __exit__(self, *a):
                stats.stop(name)

        return _Ctx()

    def summary(self) -> str:
        return " | ".join(f"{k}: {v.avg_ms:.2f} ms"
                          for k, v in self.stages.items())
