"""Name-routed environment factory (reference ``utils/env_maker.py``).

``Particles2D-v1`` is a pure-JAX device env (rollouts compile into the
learner's XLA program); ``AntDirection-v1`` and Meta-World benchmarks run
host-side physics behind :class:`~exploring_meta_tpu.envs.host.HostVecEnv`.
"""

from __future__ import annotations

from exploring_meta_tpu.envs.particles2d import Particles2D


def make_env(name: str, workers: int = 1, seed: int = 42,
             test: bool = False, max_path_length: int = 150,
             backend: str = "auto", n_threads: int | None = None):
    """-> (env, is_device_env). ``workers`` = parallel episode slots for
    host envs (the reference's AsyncVectorEnv worker count,
    env_maker.py:18-21). Host envs step through the native C++ thread
    pool when available (``backend="auto"``); ``n_threads`` caps the pool
    (default: min(workers, cpu_count))."""
    if name.startswith("Particles2D"):
        return Particles2D(), True

    if name.startswith("AntDirection"):
        import itertools
        from exploring_meta_tpu.envs.host import AntDirectionEnv, HostVecEnv
        # Per-slot seed offsets (gym AsyncVectorEnv seeds workers seed+i):
        # identical seeds would put every episode slot's np_random in
        # lockstep, collapsing initial-state diversity across the batch.
        ctr = itertools.count()
        return HostVecEnv(lambda: AntDirectionEnv(seed=seed + next(ctr)),
                          workers, backend=backend,
                          n_threads=n_threads), False

    if name.startswith("ML"):
        import itertools
        from exploring_meta_tpu.envs.host import HostVecEnv
        from exploring_meta_tpu.envs.metaworld_adapter import (
            MetaWorldEnv, make_benchmark,
        )
        if name.startswith("ML1_"):
            bench, task_name = "ML1", name[4:]
        else:
            bench, task_name = name, None
        # ONE benchmark for all slots: construction parses every class's
        # task pickles (minutes for ML45 x workers); slots differ only in
        # their reset-noise RNG stream (seed + slot), exactly as before —
        # sample_tasks reads slot 0, whose seed is unchanged.
        shared = make_benchmark(bench, task_name, seed=seed)
        ctr = itertools.count()
        return HostVecEnv(
            lambda: MetaWorldEnv(bench, task_name, seed=seed + next(ctr),
                                 test=test, max_path_length=max_path_length,
                                 benchmark=shared),
            workers, backend=backend, n_threads=n_threads), False

    raise ValueError(f"unknown environment {name!r}")


def calculate_samples_seen(max_path_length: int, episodes: int,
                           adapt_steps: int, meta_batch_size: int,
                           num_iterations: int) -> int:
    """Sample-budget calculator (reference ``env_maker.py:63-72``):
    samples/iter = steps x episodes x (adapt_steps + 1) x tasks."""
    per_iter = max_path_length * episodes * (adapt_steps + 1) * meta_batch_size
    total = per_iter * num_iterations
    print(f"Samples per iteration: {per_iter}; total: {total}")
    return total
