"""Task-batched collection for host-physics meta-RL.

The per-task host iteration (trainers/rl.py host paths) steps one task's
episodes at a time: ``meta_batch x (adapt_steps+1) x horizon`` policy
round-trips per meta-iteration, each crossing host -> device -> host.
Here the whole meta-batch collects in lockstep through one
``n_tasks * episodes``-slot vec env (:func:`exploring_meta_tpu.envs.host.
make_grouped_host_rollout`), with the per-task inner updates running
vmapped on device between rollout phases — ``(adapt_steps+1) x horizon``
round-trips total, a ``meta_batch``-fold reduction, and every physics
step of every task fanned across the native thread pool at once.

Semantics match per-task collection exactly (same losses, same
first-order inner updates — reference ``fast_adapt_trpo/ppo/vpg``,
``core_functions/rl.py:229-406``); only the host scheduling changes.
The collected replays feed the same outer steps: ``meta_optimize_trpo``
for TRPO, ``make_replay_meta_loss`` for PPO/VPG.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig, _query_metrics, single_adapt_step,
)


def broadcast_params(params, n_tasks: int):
    """Stack the shared init over a leading [n_tasks] axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_tasks,) + x.shape), params)


# jit wrappers are cached on (algo, policy, cfg) — policy/cfg are hashable
# NamedTuples — so per-iteration calls reuse the compiled programs instead
# of re-tracing (a fresh jax.jit object per call would never hit the
# compile cache; remote XLA compiles cost seconds to minutes here).

@functools.lru_cache(maxsize=64)
def _batched_inner(algo: str, policy, cfg: RLConfig,
                   ppo_epochs: int | None = None):
    """``ppo_epochs=None`` -> ``cfg.ppo_epochs`` (the fast_adapt_ppo
    training/eval semantics); analysis callers that rebuild the
    reference's analysis-side single_ppo_update pass 1."""
    epochs = cfg.ppo_epochs if ppo_epochs is None else ppo_epochs
    return jax.jit(jax.vmap(
        lambda p, t: single_adapt_step(algo, policy, p, t, cfg,
                                       ppo_epochs=epochs)))


@functools.lru_cache(maxsize=1)
def _batched_query_metrics():
    return jax.jit(jax.vmap(_query_metrics))


def adapt_task_batched(algo: str, policy, params, grouped_roll: Callable,
                       tasks, key, cfg: RLConfig):
    """Adapt-only lockstep pass: ``cfg.adapt_steps`` batched support
    rollouts with vmapped per-task inner updates in between — no query
    rollout. -> ``(adapted_params_stack, support_replays, keys_left)``
    where ``support_replays`` has leading ``[n_tasks, adapt_steps]`` axes.
    Used by evaluation, which measures its own fresh rollout afterwards.
    """
    n_tasks = len(tasks)
    cur = broadcast_params(params, n_tasks)
    inner = _batched_inner(algo, policy, cfg)

    replay = []
    for _ in range(cfg.adapt_steps):
        key, k = jax.random.split(key)
        support = grouped_roll(cur, tasks, k)
        replay.append(support)
        cur = inner(cur, support)
    # adapt_steps=0 (zero-shot evaluation): nothing was collected
    stacked = (jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1),
                                      *replay) if replay else None)
    return cur, stacked, key


def collect_task_batched(algo: str, policy, params,
                         grouped_roll: Callable, tasks, key,
                         cfg: RLConfig):
    """One meta-batch collection pass, task-batched.

    ``grouped_roll(params_stack, tasks, key) -> Trajectory`` with leading
    ``[n_tasks, T, episodes, ...]`` axes (make_grouped_host_rollout).

    -> ``(adapted_params_stack, replays, metrics)`` where ``replays`` has
    leading ``[n_tasks, adapt_steps+1]`` axes (the stack_replays layout
    consumed by ``meta_optimize_trpo`` / ``make_replay_meta_loss``) and
    ``metrics`` holds the query-rollout reward/success means.
    """
    n_tasks = len(tasks)
    cur = broadcast_params(params, n_tasks)
    inner = _batched_inner(algo, policy, cfg)

    replay = []
    for _ in range(cfg.adapt_steps):
        key, k = jax.random.split(key)
        support = grouped_roll(cur, tasks, k)
        replay.append(support)
        cur = inner(cur, support)

    key, k = jax.random.split(key)
    query = grouped_roll(cur, tasks, k)
    replay.append(query)

    # [n_tasks, adapt_steps+1, T, E, ...]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1),
                                     *replay)
    ms = _batched_query_metrics()(query)
    metrics = {"reward": float(jnp.mean(ms["reward"])),
               "success": float(jnp.mean(ms["success"]))}
    return cur, stacked, metrics
