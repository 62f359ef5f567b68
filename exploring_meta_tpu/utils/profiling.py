"""Tracing / profiling as a framework feature (SURVEY.md §5 row 1).

The reference's only timing is tqdm wall-clock; here every trainer can
record per-phase times (sample / rollout / adapt / meta-step) and capture
full ``jax.profiler`` device traces for TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device results so
    timings reflect real execution, not async dispatch."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": round(total, 4),
                       "mean_ms": round(1e3 * total / max(self.counts[name], 1), 3),
                       "count": self.counts[name]}
                for name, total in self.totals.items()}

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, sort_keys=True, indent=4)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
