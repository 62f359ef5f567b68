"""Meta-RL evaluation: adapt to held-out tasks, measure query performance.

Reference ``evaluate`` (``core_functions/rl.py:142-196``) with its three
task-selection modes: ``n_tasks`` sampled tasks, ``each3`` (3 trials per
distinct task id — Meta-World), or one explicit named task — plus the
``test_on_train`` switch that evaluates on the benchmark's TRAIN task set
(rl.py:147-153) and the ``rewards_per_task`` output keyed by ML10 task
NAME (rl.py:143,186-190) that feeds the bar plotters.
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
    # Eval table first, else train table (reference rl.py:130-133) — the
    # two tables share int ids, so they must NOT be merged.
    table = (ML10_EVAL_TASK_NAMES
             if task_name in ML10_EVAL_TASK_NAMES.values()
             else ML10_TRAIN_TASK_NAMES)
    index = {v: k for k, v in table.items()}[task_name]
    for t in env.sample_tasks(key, pool):
        if t["task"] == index:
            return t
    return None


def evaluate(algo: str, policy, params, env, rollout_fn: Callable,
             cfg: RLConfig, n_tasks: int | str, key,
             device_env: bool = True, each3: bool = False,
             test_on_train: bool = False, extra_info: bool = False,
             task_batch: bool = False,
             grouped_roll_factory: Callable | None = None) -> dict:
    """Adapt + evaluate on fresh tasks; -> metrics dict with per-task
    rewards, mean reward, mean success rate, and (Meta-World) rewards
    grouped by task name.

    Task selection (reference rl.py:155-161): ``n_tasks`` int samples that
    many tasks; ``each3=True`` takes 3 trials of every distinct task id;
    a string ``n_tasks`` selects one explicitly named ML10 task.

    ``test_on_train`` only picks the name table here (rl.py:147-150); the
    caller owns env construction with ``test=(not test_on_train)`` — use
    :func:`meta_test` for the full reference contract.

    ``extra_info=True`` (reference rl.py:152: env is Meta-World) groups
    ``[reward, success]`` pairs per task name into ``rewards_per_task``.

    ``device_env=True`` vmaps all task adaptations into one XLA program;
    ``False`` loops eagerly (host-physics envs, whose tasks may be
    arbitrary Python objects).

    ``task_batch=True`` (host envs) adapts and evaluates ALL selected
    tasks in lockstep through one big vec env (rl/host_batched.py) —
    one policy round-trip per step for the whole task list.
    ``grouped_roll_factory(n_tasks)`` must build the matching grouped
    rollout (meta_test provides it from the env name).

    Note: ``mean_reward`` is the true mean over the evaluated task list —
    the reference divides by ``params['n_tasks']`` even under ``each3``
    where the list is longer (rl.py:191), which we treat as a bug.
    """
    if device_env and (each3 or isinstance(n_tasks, str)):
        raise ValueError(
            "each3 / explicit-task selection needs dict tasks with a "
            "'task' id (Meta-World-style host envs); this env samples "
            "plain array tasks")
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
        # jit the whole vmapped evaluation: standalone (un-jitted) scans
        # execute pathologically slowly on this runtime (CLAUDE.md), and
        # the rollout scans inside fast_adapt_* would otherwise run eager.
        # One compile per evaluate() call — callers construct a fresh env/
        # rollout per meta_test, so there is no reusable cache key.
        rewards, successes = jax.jit(jax.vmap(eval_one))(tasks, keys)
    elif task_batch:
        # Adapt all tasks in lockstep (adapt-only: evaluation does not
        # need fast_adapt's internal query loss), then one batched
        # measurement rollout with the per-task adapted policies — the
        # adapt-then-fresh-rollout contract of eval_one with n_tasks-fold
        # fewer per-step round-trips AND one fewer rollout phase.
        from exploring_meta_tpu.rl.host_batched import (
            _batched_query_metrics, adapt_task_batched,
        )
        if grouped_roll_factory is None:
            raise ValueError("task_batch=True needs grouped_roll_factory")
        grouped = grouped_roll_factory(n_tasks)
        key, ck = jax.random.split(key)
        adapted, _, ck = adapt_task_batched(algo, policy, params, grouped,
                                            tasks, ck, cfg)
        query = grouped(adapted, tasks, jax.random.fold_in(ck, 1))
        ms = _batched_query_metrics()(query)
        rewards, successes = ms["reward"], ms["success"]
    else:
        pairs = [eval_one(task, k) for task, k in zip(tasks, keys)]
        rewards = jnp.stack([p[0] for p in pairs])
        successes = jnp.stack([p[1] for p in pairs])

    # Per-task-name grouping (reference rl.py:186-190): alternating
    # [reward, success_rate] pairs per name, the bar_plot_ml10 contract.
    rewards_per_task: dict = {}
    if extra_info and not device_env:
        names = (ML10_TRAIN_TASK_NAMES if test_on_train
                 else ML10_EVAL_TASK_NAMES)
        for task, rew, suc in zip(tasks, rewards, successes):
            name = names.get(task["task"], str(task["task"]))
            rewards_per_task.setdefault(name, []).extend(
                [float(rew), float(suc)])

    return {
        "tasks_rewards": [float(r) for r in rewards],
        "tasks_success_rate": [float(s) for s in successes],
        "mean_reward": float(jnp.mean(rewards)),
        "mean_success": float(jnp.mean(successes)),
        "rewards_per_task": rewards_per_task,
    }


def meta_test(algo: str, env_name: str, policy, params, cfg: RLConfig,
              n_tasks: int | str, key, seed: int = 42,
              test_on_train: bool = False, each3: bool = False,
              workers: int | None = None, task_batch: bool = False) -> dict:
    """The reference's full ``evaluate`` contract (rl.py:142-196): build a
    FRESH env from the name with ``test=(not test_on_train)`` (rl.py:153),
    then adapt + evaluate. Routes device envs through the vmapped path and
    host envs (MuJoCo / Meta-World) through the eager path.

    ``workers`` = host-env episode slots; defaults to
    ``cfg.adapt_batch_size`` so one HostVecEnv.collect yields the full
    episode batch (the reference steps 1 worker x adapt_batch_size
    sequential episodes — same data, lockstep here)."""
    from exploring_meta_tpu.envs.factory import make_env
    from exploring_meta_tpu.rl.rollout import make_rollout

    # Under task_batch the named env only serves sample_tasks — all
    # rollouts go through the grouped factory's own big vec env — so
    # don't spawn adapt_batch_size physics instances just for that.
    env, is_device = make_env(env_name,
                              workers=(1 if task_batch
                                       else workers or cfg.adapt_batch_size),
                              seed=seed, test=(not test_on_train),
                              max_path_length=cfg.max_path_length)
    grouped_roll_factory = None
    if is_device:
        roll = make_rollout(env, policy.sample,
                            episodes=cfg.adapt_batch_size,
                            horizon=cfg.max_path_length)
    elif task_batch:
        from exploring_meta_tpu.envs.host import make_grouped_roll_factory
        roll = None  # evaluation goes through the grouped rollout
        grouped_roll_factory = make_grouped_roll_factory(
            env_name, policy, cfg, seed, test=(not test_on_train))
    else:
        from exploring_meta_tpu.envs.host import make_host_rollout
        roll = make_host_rollout(env, policy, cfg.max_path_length)
    return evaluate(algo, policy, params, env, roll, cfg, n_tasks, key,
                    device_env=is_device, each3=each3,
                    test_on_train=test_on_train,
                    extra_info=env_name.startswith("ML"),
                    task_batch=task_batch and not is_device,
                    grouped_roll_factory=grouped_roll_factory)
