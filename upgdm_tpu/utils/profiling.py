"""Profiling and phase-timing hooks — first-class here.

The reference has no tracing at all (SURVEY.md §5: tqdm bars and commented
time.time() probes only).  This module provides:

  - ``phase_timer``: nested wall-clock phase timing with a report table;
  - ``trace``: a context manager around ``jax.profiler`` traces (viewable in
    TensorBoard / Perfetto);
  - ``annotate``: named TraceAnnotation scopes visible inside device traces;
  - ``device_memory_stats``: live per-device memory snapshot.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

__all__ = ["PhaseTimer", "phase_timer", "trace", "annotate", "device_memory_stats"]


class PhaseTimer:
    """Accumulating named-phase wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                          total_s   calls   mean_ms"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30} {total:8.3f} {n:7d} {1000*total/max(n,1):9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {"total_s": t, "calls": self.counts[name]}
            for name, t in self.totals.items()
        }

    def save(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.as_dict(), indent=2))


_GLOBAL_TIMER = PhaseTimer()


def phase_timer() -> PhaseTimer:
    return _GLOBAL_TIMER


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/upgdm_trace", create_perfetto_link: bool = False):
    """jax.profiler trace scope (open in TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named annotation visible in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats(device=None) -> Optional[dict]:
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats
