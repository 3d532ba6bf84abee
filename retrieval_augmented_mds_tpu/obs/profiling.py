"""Profiling: per-phase wall timing + XLA device traces.

The reference exposes a profiler hook but never turns it on and ships an
unused wall-clock `timer` decorator (SURVEY.md §5.1, sotasum/mips.py:73-84).
Here profiling is first-class: `phase_timer` feeds the benchmark reports
(embed/search/merge breakdowns), `trace` wraps `jax.profiler` for real
device traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimes:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def report(self) -> dict[str, float]:
        return {
            k: self.totals[k] / max(1, self.counts[k]) for k in self.totals
        }


_GLOBAL = PhaseTimes()


@contextlib.contextmanager
def phase_timer(name: str, times: PhaseTimes | None = None):
    t = times or _GLOBAL
    t0 = time.perf_counter()
    try:
        yield
    finally:
        t.totals[name] += time.perf_counter() - t0
        t.counts[name] += 1


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (open with XProf / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
