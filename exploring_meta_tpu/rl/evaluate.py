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


def evaluate(algo: str, policy, params, env, rollout_fn: Callable,
             cfg: RLConfig, n_tasks: int, key,
             device_env: bool = True) -> dict:
    """Adapt + evaluate on ``n_tasks`` fresh tasks; -> metrics dict with
    per-task rewards, mean reward, mean success rate.

    ``device_env=True`` vmaps all task adaptations into one XLA program;
    ``False`` loops eagerly (host-physics envs, whose tasks may be
    arbitrary Python objects)."""
    key, tk = jax.random.split(key)
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
