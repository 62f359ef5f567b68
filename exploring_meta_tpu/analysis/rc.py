"""Representation-change probes: CCA/CKA before vs after adaptation.

Rebuild of reference ``misc_scripts/rc_vision.py`` / ``rc_rl.py``: for each
sampled task, adapt a fresh copy of the model, extract layer activations
from the initial and adapted models on the same inputs, and measure
similarity with (SV)CCA — optionally linear/kernel CKA. Results are
{layer: [similarity per task]} dicts saved as json, plus a deterministic
sanity check (rc_rl.py:34-80): identical params on identical inputs must
give bit-identical representations.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from exploring_meta_tpu.adapt.maml import inner_sgd
from exploring_meta_tpu.rl.adapt_rl import single_adapt_step
from exploring_meta_tpu.ops.cca import get_cca_similarity
from exploring_meta_tpu.ops.cka import get_kernel_CKA, get_linear_CKA
from exploring_meta_tpu.ops.losses import cross_entropy
from exploring_meta_tpu.tasks.sampler import sample_task, split_support_query


def sanity_check(rep_fn: Callable, params, inputs) -> None:
    """Deterministic-representation assertion (reference rc_rl.py:34-80)."""
    r1 = np.asarray(rep_fn(params, inputs))
    r2 = np.asarray(rep_fn(params, inputs))
    assert np.array_equal(r1, r2), "representations are not deterministic"


def real_states(traj):
    """Flat states with post-termination filler rows removed — the
    reference walks only real episode states (rc_rl.py:246-283); frozen
    filler rows would bias the similarity statistics."""
    states = np.asarray(traj.flat(traj.state))
    mask = np.asarray(traj.flat(traj.valid)) > 0
    return states[mask]


def _similarities(init_rep, adapted_rep, compare: tuple):
    """Similarity measures on [N, features] activations."""
    out = {}
    a = np.asarray(adapted_rep).reshape(adapted_rep.shape[0], -1)
    b = np.asarray(init_rep).reshape(init_rep.shape[0], -1)
    if "cca" in compare:
        # CCA wants the smaller axis first. The reference follows the same
        # rule implicitly: conv reps go in as (batch, C*H*W) with batch <
        # features (rc_vision.py:150-162) and MLP reps as (features, N)
        # with features < N (rc_rl.py:276).
        if a.shape[0] == a.shape[1]:
            # exactly-square activations satisfy neither orientation
            # (get_cca_similarity asserts a STRICT states > features
            # imbalance); dropping one state breaks the tie harmlessly
            a, b = a[:-1], b[:-1]
        ca, cb = (a, b) if a.shape[0] < a.shape[1] else (a.T, b.T)
        out["cca"] = get_cca_similarity(ca, cb, epsilon=1e-10)[1]
    if "cka_linear" in compare:
        out["cka_linear"] = float(get_linear_CKA(a, b))
    if "cka_kernel" in compare:
        out["cka_kernel"] = float(get_kernel_CKA(a, b))
    return out


def run_rep_exp(path, apply_fn: Callable, rep_fn: Callable, params, dataset,
                ways: int, shots: int, key, rep_params: dict | None = None,
                compare: tuple = ("cca",)) -> dict:
    """Vision representation-change experiment.

    ``apply_fn(params, x) -> logits`` (for the adaptation loss);
    ``rep_fn(params, x, layer) -> activations`` (the per-layer tap,
    models.get_rep_layer). -> {"cca": {layer: [per-task sims]}, ...}
    saved to ``<path>/rep_exp/``.
    """
    rep_params = dict(rep_params or {"adapt_steps": 1, "inner_lr": 0.1,
                                     "n_tasks": 5, "layers": [4]})
    rep_path = os.path.join(path, "rep_exp")
    os.makedirs(rep_path, exist_ok=True)

    results = {m: {str(l): [] for l in rep_params["layers"]} for m in compare}

    def loss_fn(p, batch):
        x, y = batch
        return cross_entropy(apply_fn(p, x), y)

    for _ in range(rep_params["n_tasks"]):
        key, k = jax.random.split(key)
        data, labels = sample_task(k, dataset.images, ways, shots,
                                   dataset.invert, dataset.rotations)
        support, query = split_support_query(data, labels, shots, ways)
        adapted = inner_sgd(loss_fn, params, support,
                            rep_params["inner_lr"],
                            rep_params["adapt_steps"])
        for layer in rep_params["layers"]:
            init_rep = rep_fn(params, query[0], layer)
            adapted_rep = rep_fn(adapted, query[0], layer)
            sims = _similarities(init_rep, adapted_rep, compare)
            for metric, value in sims.items():
                results[metric][str(layer)].append(float(value))

    for metric, per_layer in results.items():
        with open(os.path.join(rep_path, f"{metric}_results.json"), "w") as f:
            json.dump(per_layer, f, sort_keys=True, indent=4)
    return results


def _per_state_similarity(rep_a, rep_b, max_states: int = 50):
    """Per-STATE similarity between two models' representation vectors:
    |Pearson correlation| of the two vectors, averaged/stdev'd over
    states — the reference's ``episode_mean_var``/``calculate_rep_change``
    (rc_rl.py:246-283), whose per-state "CCA" on a (1, features) matrix
    reduces to exactly this correlation. Capped at ``max_states`` states
    (the reference walks every state of every episode; the statistic
    converges long before that)."""
    a = np.asarray(rep_a)[:max_states]
    b = np.asarray(rep_b)[:max_states]
    sims = []
    for ra, rb in zip(a, b):
        ra = ra.reshape(-1).astype(np.float64)
        rb = rb.reshape(-1).astype(np.float64)
        ra = ra - ra.mean()
        rb = rb - rb.mean()
        denom = np.linalg.norm(ra) * np.linalg.norm(rb)
        if denom > 0:
            sims.append(abs(float(ra @ rb / denom)))
        # constant/dead representations carry no similarity information:
        # skip them rather than report a fake 1.0 that inflates the mean
    if not sims:
        return 1.0, 0.0  # every state constant under both models
    return float(np.mean(sims)), float(np.std(sims, ddof=1) if len(sims) > 1
                                       else 0.0)


def run_rep_rl_exp(path, policy, params, env, rollout_fn: Callable, cfg,
                   key, rep_params: dict | None = None,
                   compare: tuple = ("cca",), algo: str = "trpo",
                   eval_each_task: bool = False,
                   grouped_roll_factory: Callable | None = None) -> dict:
    """RL representation-change experiment (reference rc_rl.py:83-221).

    Per task: adapt step by step (vpg/ppo/trpo inner updates), tracking
    - ACROSS STEPS: per-state similarity (mean, stdev) between the INIT
      and post-step models and between consecutive step models, on the
      support states (reference ``change_across_steps``);
    - ACROSS LAYERS: CCA between the init and fully-adapted models per
      layer on the query states. NOTE the reference's final across-layers
      comparison clones the adapted model into ``before_adapt_model``
      first (rc_rl.py:167,170), comparing the adapted model with ITSELF
      (similarity ~= 1 by construction); we keep the meaningful
      init-vs-adapted comparison instead.
    - per-task success rate before/after adaptation;
    then averages layer changes over tasks (mean, stdev) and writes
    ``rep_params.json`` + results json + the layer-average errorbar plot
    (reference ``plot_sim_across_layers_average``, rc_rl.py:374-391).

    ``eval_each_task=True`` evaluates 3 trials of every distinct task id
    (Meta-World; reference rep_params['eval_each_task']).

    ``grouped_roll_factory`` (host envs; rl/host_batched.py) collects all
    tasks' rollouts in lockstep — (adapt_steps+1) batched rollout phases
    instead of n_tasks*(adapt_steps+1) — with identical probe math and
    artifact layout (probe lists stay task-major).
    """
    from exploring_meta_tpu.rl.evaluate import sample_3_from_each_task
    from exploring_meta_tpu.utils.plotter import (
        plot_sim_across_layers_average,
    )

    # Default layers = the reference eval config's (eval_rl.py:77); layer
    # indices are MODULE-counted (see models/policies.py
    # get_representation): 2/4 = Linear outputs, -1 = pre-head tap.
    rep_params = dict(rep_params or {"n_tasks": 5, "layers": [2, 4, -1]})
    layers = rep_params["layers"]
    adapt_steps = rep_params.get("adapt_steps", cfg.adapt_steps)
    rep_path = os.path.join(path, "rep_exp")
    os.makedirs(rep_path, exist_ok=True)

    key, kt = jax.random.split(key)
    if eval_each_task:
        tasks = sample_3_from_each_task(env, kt)
    else:
        tasks = env.sample_tasks(kt, rep_params["n_tasks"])
    host_env = hasattr(env, "collect")
    n_tasks = len(tasks)

    results = {m: {str(l): [] for l in layers} for m in compare}
    across_steps = {"init_mean": [], "init_var": [],
                    "adapt_mean": [], "adapt_var": []}
    performance = []

    _real_states = real_states

    def probe_step(task_idx, support_i, before_i, after_i, buf):
        """Per-(task, step) probes on the support states."""
        states = _real_states(support_i)
        rep_init = policy.get_representation(params, states)
        rep_before = policy.get_representation(before_i, states)
        rep_after = policy.get_representation(after_i, states)
        im, iv = _per_state_similarity(rep_init, rep_after)
        am, av = _per_state_similarity(rep_before, rep_after)
        buf.append((im, iv, am, av))

    def probe_layers(query_i, adapted_i):
        """Final across-layers CCA probes on the query states."""
        states = _real_states(query_i)
        for layer in layers:
            init_rep = policy.get_representation(params, states, layer)
            adapted_rep = policy.get_representation(adapted_i, states, layer)
            sims = _similarities(init_rep, adapted_rep, compare)
            for metric, value in sims.items():
                results[metric][str(layer)].append(float(value))

    if host_env and grouped_roll_factory is not None:
        from exploring_meta_tpu.rl.host_batched import (
            _batched_inner, broadcast_params,
        )
        grouped = grouped_roll_factory(n_tasks)
        # ppo_epochs=1: the reference's analysis-side inner update is a
        # SINGLE clipped update (single_ppo_update, rl.py:319-336)
        inner = _batched_inner(algo, policy, cfg, ppo_epochs=1)
        task_at = lambda tree, i: jax.tree_util.tree_map(
            lambda x: x[i], tree)

        cur = broadcast_params(params, n_tasks)
        step_bufs = [[] for _ in range(n_tasks)]
        suc_before = [0.0] * n_tasks
        suc_after = [0.0] * n_tasks
        for step in range(adapt_steps):
            key, k = jax.random.split(key)
            support = grouped(cur, tasks, k)
            after = inner(cur, support)
            for i in range(n_tasks):
                sup_i = task_at(support, i)
                suc = float(jnp.mean(sup_i.episode_successes()))
                if step == 0:
                    suc_before[i] = suc
                suc_after[i] = suc
                probe_step(i, sup_i, task_at(cur, i), task_at(after, i),
                           step_bufs[i])
            cur = after

        key, kq = jax.random.split(key)
        query = grouped(cur, tasks, kq)
        sanity_check(lambda p, x: policy.get_representation(p, x), params,
                     _real_states(task_at(query, 0)))
        for i in range(n_tasks):  # flatten probes task-major (artifact
            for im, iv, am, av in step_bufs[i]:  # parity with the loop)
                across_steps["init_mean"].append(im)
                across_steps["init_var"].append(iv)
                across_steps["adapt_mean"].append(am)
                across_steps["adapt_var"].append(av)
            performance.append({"success_before": suc_before[i],
                                "success_after": suc_after[i]})
            probe_layers(task_at(query, i), task_at(cur, i))
    else:
        def _roll_adapt(p, t, k):
            s = rollout_fn(p, t, k)
            return s, single_adapt_step(algo, policy, p, s, cfg)

        if host_env:
            roll_adapt, jit_roll = _roll_adapt, rollout_fn
        else:
            # Device envs: rollout + inner update as ONE jitted program
            # (standalone scans execute pathologically slowly on this
            # runtime — CLAUDE.md); compiled once, reused across the
            # n_tasks x adapt_steps loop. Key sequence unchanged.
            roll_adapt, jit_roll = jax.jit(_roll_adapt), jax.jit(rollout_fn)

        for i in range(n_tasks):
            key, ka = jax.random.split(key)
            task = tasks[i] if isinstance(tasks, list) else \
                jax.tree_util.tree_map(lambda x: x[i], tasks)

            before = params
            suc_before = suc_after = 0.0
            buf: list = []
            for step in range(adapt_steps):
                ka, k = jax.random.split(ka)
                support, after = roll_adapt(before, task, k)
                if step == 0:
                    suc_before = float(jnp.mean(support.episode_successes()))
                suc_after = float(jnp.mean(support.episode_successes()))
                probe_step(i, support, before, after, buf)
                before = after

            for im, iv, am, av in buf:
                across_steps["init_mean"].append(im)
                across_steps["init_var"].append(iv)
                across_steps["adapt_mean"].append(am)
                across_steps["adapt_var"].append(av)
            performance.append({"success_before": suc_before,
                                "success_after": suc_after})

            key, kq = jax.random.split(key)
            query = jit_roll(before, task, kq)
            sanity_check(lambda p, x: policy.get_representation(p, x),
                         params, _real_states(query))
            probe_layers(query, before)

    # average layer change over tasks (reference av_layer_changes)
    av_mean, av_std = {}, {}
    if "cca" in compare:
        for layer, values in results["cca"].items():
            av_mean[layer] = float(np.mean(values))
            av_std[layer] = float(np.std(values, ddof=1)
                                  if len(values) > 1 else 0.0)
        plot_sim_across_layers_average(
            av_mean, av_std,
            title="Before / After adaptation",
            save_path=os.path.join(rep_path, "layer_changes_average.png"))

    for metric, per_layer in results.items():
        with open(os.path.join(rep_path, f"{metric}_rl_results.json"), "w") as f:
            json.dump(per_layer, f, sort_keys=True, indent=4)
    with open(os.path.join(rep_path, "rep_params.json"), "w") as f:
        json.dump({**rep_params, "algo": algo,
                   "eval_each_task": eval_each_task}, f, sort_keys=True,
                  indent=4, default=str)
    with open(os.path.join(rep_path, "rep_extra.json"), "w") as f:
        json.dump({"across_steps": across_steps,
                   "av_layer_changes_mean": av_mean,
                   "av_layer_changes_std": av_std,
                   "performance": performance}, f, sort_keys=True, indent=4)
    results["across_steps"] = across_steps
    results["av_layer_changes"] = {"mean": av_mean, "std": av_std}
    return results


def measure_change_through_time(path, checkpoint_params: list,
                                rep_fn: Callable, inputs,
                                layer: int = -1) -> list:
    """CCA similarity of consecutive checkpoints' representations
    (reference rc_rl.py:295-353). -> list of per-step similarities."""
    sims = []
    for prev, cur in zip(checkpoint_params[:-1], checkpoint_params[1:]):
        a = np.asarray(rep_fn(prev, inputs)).reshape(len(inputs), -1)
        b = np.asarray(rep_fn(cur, inputs)).reshape(len(inputs), -1)
        # smaller axis first (see _similarities orientation note)
        ca, cb = (a, b) if a.shape[0] < a.shape[1] else (a.T, b.T)
        sims.append(get_cca_similarity(ca, cb, epsilon=1e-10)[1])
    with open(os.path.join(path, "cca_through_time.json"), "w") as f:
        json.dump(sims, f, indent=4)
    return sims
