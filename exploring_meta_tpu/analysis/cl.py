"""Continual-learning transfer experiments (vision + RL).

Rebuild of reference ``misc_scripts/cl_vision.py`` / ``cl_rl.py``: adapt a
fresh copy of the meta-trained model on task i, evaluate it on every task
j, collect the NxN matrix, and compute the CL metrics (ops/cl_metrics.py).

Vision settings (reference cl_vision.py:3-6):
  1 — evaluate on the SAME samples used for adaptation;
  2 — evaluate on held-out query samples of the same classes.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from exploring_meta_tpu.adapt.maml import inner_sgd
from exploring_meta_tpu.ops.cl_metrics import calc_cl_metrics
from exploring_meta_tpu.ops.losses import accuracy, cross_entropy
from exploring_meta_tpu.tasks.sampler import sample_task, split_support_query
from exploring_meta_tpu import rl as rl_mod


def save_acc_matrix(path: str, acc_matrix, name: str = "acc_matrix") -> None:
    np.savetxt(os.path.join(path, f"{name}.out"), np.asarray(acc_matrix),
               fmt="%1.2f")


def run_cl_exp(path, apply_fn: Callable, params, dataset, ways: int,
               shots: int, key, cl_params: dict | None = None,
               setting: int = 1, features_fn: Callable | None = None,
               head_apply: Callable | None = None) -> tuple:
    """Vision CL experiment -> (acc_matrix, metrics dict).

    ``apply_fn(params, x) -> logits``. For ANIL runs pass ``features_fn``
    (body encoder, applied once per task) and ``head_apply``: adaptation
    then moves only the head on frozen features — the reference's ANIL CL
    behavior (eval_vision.py:117-182 adapts the MAML-wrapped head).
    """
    cl_params = dict(cl_params or {"adapt_steps": 1, "inner_lr": 0.1,
                                   "n_tasks": 10})
    cl_path = os.path.join(path, "cl_exp")
    os.makedirs(cl_path, exist_ok=True)

    anil = features_fn is not None

    # Build the task pool (features pre-encoded once for ANIL, mirroring
    # prepare_batch(features=...)).
    pool = []
    for _ in range(cl_params["n_tasks"]):
        key, k = jax.random.split(key)
        data, labels = sample_task(k, dataset.images, ways, shots,
                                   dataset.invert, dataset.rotations)
        if anil:
            data = features_fn(params, data)
        support, query = split_support_query(data, labels, shots, ways)
        pool.append({"adapt": support,
                     "eval": support if setting == 1 else query})

    if anil:
        adapt_params = params["head"]
        fwd = lambda head, x: head_apply({"head": head}, x)
    else:
        adapt_params = params
        fwd = apply_fn

    def loss_fn(p, batch):
        x, y = batch
        return cross_entropy(fwd(p, x), y)

    @jax.jit
    def adapt_and_eval(adapt_params, adapt_batch, eval_batches):
        adapted = inner_sgd(loss_fn, adapt_params, adapt_batch,
                            cl_params["inner_lr"], cl_params["adapt_steps"])
        return jax.vmap(
            lambda b: accuracy(fwd(adapted, b[0]), b[1]))(eval_batches)

    eval_stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[t["eval"] for t in pool])

    n = cl_params["n_tasks"]
    acc_matrix = np.zeros((n, n))
    for i, task_i in enumerate(pool):
        acc_matrix[i] = np.asarray(
            adapt_and_eval(adapt_params, task_i["adapt"], eval_stack))

    cl_res = calc_cl_metrics(acc_matrix)
    save_acc_matrix(cl_path, acc_matrix)
    with open(os.path.join(cl_path, "cl_params.json"), "w") as f:
        json.dump(cl_params, f, sort_keys=True, indent=4)
    with open(os.path.join(cl_path, "cl_res.json"), "w") as f:
        json.dump(cl_res, f, sort_keys=True, indent=4)
    return acc_matrix, cl_res


def sample_one_from_each_task(env, key, pool: int = 50):
    """One task per distinct task id (reference ``sample_from_each_task``,
    cl_rl.py:187-198) — the ML10 CL matrix covers each benchmark task
    once."""
    from exploring_meta_tpu.rl.evaluate import sample_3_from_each_task
    return sample_3_from_each_task(env, key, pool=pool, per_task=1)


def run_cl_rl_exp(path, policy, params, env, rollout_fn: Callable,
                  cfg: "rl_mod.RLConfig", key, n_tasks: int = 5,
                  algo: str = "trpo", eval_batch_size: int | None = None,
                  normalize_rewards: bool = False,
                  one_per_task: bool = False,
                  grouped_roll_factory: Callable | None = None) -> tuple:
    """RL CL experiment -> (rew_matrix, cl_res_rew, cl_res_suc).

    Reference ``run_cl_rl_exp`` (cl_rl.py:26-153): per train-task i, adapt
    a fresh copy of the policy (vpg/ppo/trpo inner updates), then roll out
    the adapted policy on every task j. ``one_per_task=True`` builds the
    matrix over one sample of each distinct task id (Meta-World; the
    reference's ML10 mode). Host envs additionally record per-step
    adaptation progress (reward + success per adapt step per task,
    cl_rl.py:59-91) into ``cl_exp/adapt_progress.json``.

    ``grouped_roll_factory`` (host envs; see rl/host_batched.py) switches
    to task-batched collection: all n adaptations run in lockstep
    (adapt_steps batched rollout phases instead of n*adapt_steps), and
    each matrix row evaluates on all n tasks in one batched rollout
    (n phases instead of n^2) — same math, n-fold fewer per-step policy
    round-trips.
    """
    if algo not in ("vpg", "ppo", "trpo"):
        raise ValueError(f"unknown adaptation algo {algo!r}")
    cl_path = os.path.join(path, "cl_exp")
    os.makedirs(cl_path, exist_ok=True)

    key, tk = jax.random.split(key)
    if one_per_task:
        tasks = sample_one_from_each_task(env, tk)
        n_tasks = len(tasks)
    else:
        tasks = env.sample_tasks(tk, n_tasks)
    # Host envs (MuJoCo / Meta-World) step physics eagerly — loop instead
    # of vmapping/jitting (the reference is always eager: cl_rl.py:49-124).
    # Detect by the vec-env collection API, NOT the task container type:
    # Meta-World tasks are dict lists but Ant tasks are plain ndarrays.
    host_env = hasattr(env, "collect")

    # Matrix cells are evaluated with ``eval_batch_size`` episodes
    # (reference cl_rl.py:105-107), distinct from the adaptation batch.
    # Device envs build a wider rollout; host vec envs have a fixed slot
    # count — size the env's ``workers`` accordingly there.
    eval_roll = rollout_fn
    if eval_batch_size is not None and not host_env:
        from exploring_meta_tpu.rl.rollout import make_rollout
        eval_roll = make_rollout(env, policy.sample,
                                 episodes=eval_batch_size,
                                 horizon=cfg.max_path_length)
    maybe_jit = (lambda f: f) if host_env else jax.jit

    rew_progress: dict = {}
    suc_progress: dict = {}

    def adapt_host(task, k, task_idx):
        """Per-step adaptation with progress tracking (host path)."""
        p = params
        rew_progress[f"task_{task_idx + 1}"] = {}
        suc_progress[f"task_{task_idx + 1}"] = {}
        for step in range(cfg.adapt_steps):
            k, kk = jax.random.split(k)
            support = rollout_fn(p, task, kk)
            p = rl_mod.single_adapt_step(algo, policy, p, support, cfg)
            rew_progress[f"task_{task_idx + 1}"][f"step_{step}"] = float(
                jnp.sum(support.reward * support.valid) / support.n_episodes)
            suc_progress[f"task_{task_idx + 1}"][f"step_{step}"] = float(
                jnp.mean(support.episode_successes()))
        return p

    @maybe_jit
    def adapt_on(task, k):
        if algo == "vpg":
            adapted, _, _ = rl_mod.fast_adapt_vpg(policy, params, rollout_fn,
                                                  task, k, cfg)
        elif algo == "ppo":
            adapted, _, _ = rl_mod.fast_adapt_ppo(policy, params, rollout_fn,
                                                  task, k, cfg)
        else:
            adapted, _, _, _ = rl_mod.fast_adapt_trpo(policy, params,
                                                      rollout_fn, task, k,
                                                      cfg)
        return adapted

    def eval_one(adapted, task, kk):
        traj = eval_roll(adapted, task, kk)
        rew = jnp.sum(traj.reward * traj.valid) / traj.n_episodes
        suc = jnp.mean(traj.episode_successes())
        return rew, suc

    @maybe_jit
    def eval_on_all(adapted, k):
        keys = jax.random.split(k, n_tasks)
        if host_env:
            pairs = [eval_one(adapted, t, kk) for t, kk in zip(tasks, keys)]
            return (jnp.stack([p[0] for p in pairs]),
                    jnp.stack([p[1] for p in pairs]))
        return jax.vmap(lambda t, kk: eval_one(adapted, t, kk))(tasks, keys)

    rew_matrix = np.zeros((n_tasks, n_tasks))
    suc_matrix = np.zeros((n_tasks, n_tasks))
    if host_env and grouped_roll_factory is not None:
        from exploring_meta_tpu.rl.host_batched import (
            _batched_inner, _batched_query_metrics, broadcast_params,
        )
        grouped = grouped_roll_factory(n_tasks)
        qm = _batched_query_metrics()
        traj_metrics = lambda q: (lambda m: (m["reward"], m["success"]))(
            qm(q))
        # ppo_epochs=1: the reference's analysis-side inner update is a
        # SINGLE clipped update (single_ppo_update, rl.py:319-336)
        inner = _batched_inner(algo, policy, cfg, ppo_epochs=1)

        # All n adaptations in lockstep, progress recorded per step.
        cur = broadcast_params(params, n_tasks)
        for step in range(cfg.adapt_steps):
            key, kk = jax.random.split(key)
            support = grouped(cur, tasks, kk)
            rews, sucs = traj_metrics(support)
            for i in range(n_tasks):
                rew_progress.setdefault(f"task_{i + 1}", {})[
                    f"step_{step}"] = float(rews[i])
                suc_progress.setdefault(f"task_{i + 1}", {})[
                    f"step_{step}"] = float(sucs[i])
            cur = inner(cur, support)

        # Row i of the matrix: adapted policy i on ALL tasks, one batched
        # rollout per row.
        for i in range(n_tasks):
            key, ke = jax.random.split(key)
            adapted_i = jax.tree_util.tree_map(lambda x: x[i], cur)
            traj = grouped(broadcast_params(adapted_i, n_tasks), tasks, ke)
            rews, sucs = traj_metrics(traj)
            rew_matrix[i] = np.asarray(rews)
            suc_matrix[i] = np.asarray(sucs)
    else:
        for i in range(n_tasks):
            key, ka, ke = jax.random.split(key, 3)
            task_i = tasks[i] if host_env else jax.tree_util.tree_map(
                lambda x: x[i], tasks)
            adapted = adapt_host(task_i, ka, i) if host_env else adapt_on(
                task_i, ka)
            rews, sucs = eval_on_all(adapted, ke)
            rew_matrix[i] = np.asarray(rews)
            suc_matrix[i] = np.asarray(sucs)

    if normalize_rewards:  # reference cl_rl.py:127-133 (sklearn normalize)
        norms = np.linalg.norm(rew_matrix, axis=1, keepdims=True)
        rew_matrix = rew_matrix / np.maximum(norms, 1e-12)

    cl_res_rew = calc_cl_metrics(rew_matrix)
    cl_res_suc = calc_cl_metrics(suc_matrix)

    save_acc_matrix(cl_path, rew_matrix, name="cl_rew_matrix")
    save_acc_matrix(cl_path, suc_matrix, name="cl_suc_matrix")
    with open(os.path.join(cl_path, "cl_res_rew.json"), "w") as f:
        json.dump(cl_res_rew, f, sort_keys=True, indent=4)
    with open(os.path.join(cl_path, "cl_res_suc.json"), "w") as f:
        json.dump(cl_res_suc, f, sort_keys=True, indent=4)
    with open(os.path.join(cl_path, "cl_params.json"), "w") as f:
        json.dump({"algo": algo, "n_tasks": n_tasks,
                   "adapt_steps": cfg.adapt_steps,
                   "adapt_batch_size": cfg.adapt_batch_size,
                   "inner_lr": cfg.inner_lr, "gamma": cfg.gamma,
                   "tau": cfg.tau, "max_path_length": cfg.max_path_length,
                   "normalize_rewards": normalize_rewards,
                   "one_per_task": one_per_task}, f, sort_keys=True,
                  indent=4)
    if host_env:
        with open(os.path.join(cl_path, "adapt_progress.json"), "w") as f:
            json.dump({"reward": rew_progress, "success": suc_progress},
                      f, sort_keys=True, indent=4)
    return rew_matrix, cl_res_rew, cl_res_suc
