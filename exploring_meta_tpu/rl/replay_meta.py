"""Replay-based meta-gradients for host-physics environments.

Device envs differentiate straight through ``fast_adapt_*`` (rollouts are
``lax.scan`` inside the traced program). Host envs (MuJoCo Ant,
Meta-World) step C physics on the host, which cannot appear inside a
traced/differentiated function — so meta-optimization uses the same
replay-and-rederive trick the reference uses for TRPO
(``core_functions/rl.py:441-473``), generalized to PPO/VPG:

1. COLLECT: run the inner loop eagerly with the real host rollout fn,
   recording every trajectory (support per step + query).
2. REDERIVE: re-run ``fast_adapt_*`` under ``jax.grad``, feeding the
   recorded trajectories back instead of new rollouts. Inner updates are
   deterministic functions of (params, trajectory), so the re-run
   reproduces the collection-time adaptation exactly — now with the full
   second-order graph.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig, fast_adapt_ppo, fast_adapt_vpg,
)


def recording_rollout(rollout_fn: Callable, store: list) -> Callable:
    """Wrap a rollout fn to append every collected Trajectory to ``store``."""

    def roll(params, task, key):
        traj = rollout_fn(params, task, key)
        store.append(traj)
        return traj

    return roll


def replay_feeder(task_replays) -> Callable:
    """Rollout-fn stand-in that replays recorded trajectories in order.

    ``task_replays``: Trajectory pytree with leading [n_rollouts] axis.
    Each call returns the next rollout slice; usable inside jit/vmap
    because the call count (adapt_steps+1) is static.
    """
    counter = [0]

    def roll(params, task, key):
        i = counter[0]
        counter[0] += 1
        return jax.tree_util.tree_map(lambda x: x[i], task_replays)

    return roll


def collect_replays(algo: str, policy, params, rollout_fn: Callable,
                    task, key, cfg: RLConfig):
    """Eager collection pass -> (stacked per-task replays, query metrics)."""
    store: list = []
    rec = recording_rollout(rollout_fn, store)
    if algo == "ppo":
        _, _, metrics = fast_adapt_ppo(policy, params, rec, task, key, cfg)
    elif algo == "vpg":
        _, _, metrics = fast_adapt_vpg(policy, params, rec, task, key, cfg)
    else:
        raise ValueError(f"collect_replays: unsupported algo {algo!r} "
                         "(TRPO uses fast_adapt_trpo's replay directly)")
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *store)
    return stacked, metrics


def make_replay_meta_loss(algo: str, policy, cfg: RLConfig) -> Callable:
    """-> jit-compatible ``meta_loss(params, stacked_replays)`` where
    ``stacked_replays`` has leading [n_tasks, adapt_steps+1] axes."""

    if algo not in ("ppo", "vpg"):
        raise ValueError(f"make_replay_meta_loss: unsupported algo "
                         f"{algo!r} (TRPO uses meta_optimize_trpo)")
    fast_adapt = {"ppo": fast_adapt_ppo, "vpg": fast_adapt_vpg}[algo]

    def per_task_loss(params, task_replays):
        feeder = replay_feeder(task_replays)
        _, loss, _ = fast_adapt(policy, params, feeder, None,
                                jax.random.key(0), cfg)
        return loss

    def meta_loss(params, stacked_replays):
        losses = jax.vmap(lambda r: per_task_loss(params, r))(stacked_replays)
        return jnp.mean(losses)

    return meta_loss
