"""Shared driver for chunked fused training (--fuse N).

Both trainers run the same loop shape around their fused scans: split a
step key per chunk, run ``min(fuse, remaining)`` iterations in one XLA
program, log the stacked per-iteration metrics, advance the progress bar,
and checkpoint when a ``save_every`` boundary falls inside the chunk.
This helper owns that structure (and the interrupt-safe bookkeeping) so
vision and RL cannot drift apart.
"""

from __future__ import annotations

from typing import Callable

import jax


def drive_fused_chunks(*, total: int, fuse: int, save_every: int, key,
                       state, run_chunk: Callable, log_step: Callable,
                       postfix: Callable, save_ckpt: Callable, progress,
                       on_chunk: Callable | None = None, start: int = 0):
    """Run ``total - start`` iterations in fused chunks.

    - ``run_chunk(n, state, key) -> (state, metrics)`` with metrics leaves
      stacked ``[n]``;
    - ``log_step(metrics, j)`` records iteration ``j`` of the chunk;
    - ``postfix(metrics) -> dict`` feeds the tqdm postfix;
    - ``save_ckpt(state, iteration, key)`` checkpoints at boundaries
      (fused checkpoints land on chunk-end iterations);
    - ``on_chunk(state, iteration)`` runs after every chunk — the hook for
      KeyboardInterrupt-safe progress tracking on the trainer.

    Returns ``(state, last_iteration, key)``.
    """
    it, iteration = start, max(start - 1, 0)
    while it < total:
        n = min(fuse, total - it)
        key, k = jax.random.split(key)
        state, ms = run_chunk(n, state, k)
        # ONE device->host transfer per metric leaf: the log/postfix
        # callbacks index scalars out of every leaf (O(metrics x fuse)
        # fetches), and on the tunneled runtime each fetch is a full
        # round-trip — per-chunk logging latency would scale with fuse,
        # re-introducing the host round-trips --fuse exists to remove.
        ms = jax.device_get(ms)
        for j in range(n):
            log_step(ms, j)
        it += n
        iteration = it - 1
        if on_chunk is not None:
            on_chunk(state, iteration)
        progress.update(n)
        progress.set_postfix(postfix(ms))
        if (it // save_every) > ((it - n) // save_every):
            save_ckpt(state, iteration, key)
    return state, iteration, key
