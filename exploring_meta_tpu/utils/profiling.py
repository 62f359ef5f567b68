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
import jax.numpy as jnp


def host_sync(tree) -> None:
    """Force completion of all device work ``tree`` depends on by fetching
    a scalar reduction of it to host.

    ``jax.block_until_ready`` does NOT synchronize on this remote runtime
    (CLAUDE.md gotcha: only a host fetch that data-depends on the timed
    work is a real barrier). A per-leaf device-side sum keeps the fetch to
    one scalar instead of shipping whole pytrees over the tunnel."""
    total = jnp.zeros((), jnp.float32)
    synced = False
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            total = total + jnp.sum(leaf).astype(jnp.float32)
            synced = True
    if synced:
        float(total)  # the host fetch — returns only after everything ran


class PhaseTimer:
    """Accumulates wall-clock per named phase; fetches a scalar derived
    from ``block_on`` so timings reflect real execution, not async
    dispatch."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        """Time a block. Device outputs created INSIDE the block are
        registered by appending to the yielded list (they don't exist when
        the context opens); ``block_on`` still accepts pre-existing values.
        Both are host-fetched before the clock stops."""
        outputs: list = []
        t0 = time.perf_counter()
        try:
            yield outputs
        finally:
            if block_on is not None:
                host_sync(block_on)
            if outputs:
                host_sync(outputs)
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
