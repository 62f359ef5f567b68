"""Meta-RL evaluation: adapt to held-out tasks, measure query performance.

Reference ``evaluate`` (``core_functions/rl.py:142-196``) with its three
task-selection modes: ``n_tasks`` sampled tasks, ``each3`` (3 trials per
distinct task id — Meta-World), or one explicit named task.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig, fast_adapt_ppo, fast_adapt_trpo, fast_adapt_vpg,
)

# Meta-World ML10 task-name tables (reference rl.py:22-41)
ML10_TRAIN_TASK_NAMES = {
    0: "reach", 1: "push", 2: "pick-place", 3: "door-open",
    4: "drawer-close", 5: "button-press", 6: "peg-insert-side",
    7: "window-open", 8: "sweep", 9: "basketball",
}
ML10_EVAL_TASK_NAMES = {
    0: "drawer-open", 1: "door-close", 2: "shelf-place",
    3: "sweep-into", 4: "lever-pull",
}


def sample_3_from_each_task(env, key, pool: int = 200, per_task: int = 3):
    """Sample a large pool and keep ``per_task`` trials per distinct task id
    (reference ``sample_3_from_each_task``, rl.py:113-125). Host envs whose
    tasks are dicts with a ``task`` id (Meta-World adapter)."""
    task_list = env.sample_tasks(key, pool)
    buckets: dict = {}
    for t in task_list:
        buckets.setdefault(t["task"], []).append(t)
    out = []
    for tid in sorted(buckets):
        out.extend(buckets[tid][:per_task])
    return out


def sample_explicit_task(env, key, task_name: str, pool: int = 100):
    """Find one sampled task matching a named ML10 task (reference
    ``sample_explicit_task``, rl.py:128-139)."""
    names = {**ML10_EVAL_TASK_NAMES, **ML10_TRAIN_TASK_NAMES}
    index = {v: k for k, v in names.items()}[task_name]
    for t in env.sample_tasks(key, pool):
        if t["task"] == index:
            return t
    return None


def evaluate(algo: str, policy, params, env, rollout_fn: Callable,
             cfg: RLConfig, n_tasks: int | str, key,
             device_env: bool = True, each3: bool = False) -> dict:
    """Adapt + evaluate on fresh tasks; -> metrics dict with per-task
    rewards, mean reward, mean success rate.

    Task selection (reference rl.py:155-161): ``n_tasks`` int samples that
    many tasks; ``each3=True`` takes 3 trials of every distinct task id;
    a string ``n_tasks`` selects one explicitly named ML10 task.

    ``device_env=True`` vmaps all task adaptations into one XLA program;
    ``False`` loops eagerly (host-physics envs, whose tasks may be
    arbitrary Python objects)."""
    key, tk = jax.random.split(key)
    if each3:
        tasks = sample_3_from_each_task(env, tk)
        n_tasks = len(tasks)
    elif isinstance(n_tasks, str):
        task = sample_explicit_task(env, tk, n_tasks)
        if task is None:
            raise ValueError(f"task {n_tasks!r} not found")
        tasks, n_tasks = [task], 1
    else:
        tasks = env.sample_tasks(tk, n_tasks)

    def eval_one(task, k):
        if algo == "vpg":
            adapted, _, m = fast_adapt_vpg(policy, params, rollout_fn,
                                           task, k, cfg)
        elif algo == "ppo":
            adapted, _, m = fast_adapt_ppo(policy, params, rollout_fn,
                                           task, k, cfg)
        elif algo == "trpo":
            adapted, _, _, m = fast_adapt_trpo(policy, params, rollout_fn,
                                               task, k, cfg)
        else:
            raise ValueError(f"unknown algo {algo!r}")
        k2 = jax.random.fold_in(k, 1)
        query = rollout_fn(adapted, task, k2)
        rew = jnp.sum(query.reward * query.valid) / query.n_episodes
        suc = jnp.mean(query.episode_successes())
        return rew, suc

    keys = jax.random.split(key, n_tasks)
    if device_env:
        rewards, successes = jax.vmap(eval_one)(tasks, keys)
    else:
        pairs = [eval_one(task, k) for task, k in zip(tasks, keys)]
        rewards = jnp.stack([p[0] for p in pairs])
        successes = jnp.stack([p[1] for p in pairs])
    return {
        "tasks_rewards": [float(r) for r in rewards],
        "mean_reward": float(jnp.mean(rewards)),
        "mean_success": float(jnp.mean(successes)),
    }
