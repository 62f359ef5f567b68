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
from exploring_meta_tpu.ops.cca import get_cca_similarity
from exploring_meta_tpu.ops.cka import get_kernel_CKA, get_linear_CKA
from exploring_meta_tpu.ops.losses import cross_entropy
from exploring_meta_tpu.tasks.sampler import sample_task, split_support_query


def sanity_check(rep_fn: Callable, params, inputs) -> None:
    """Deterministic-representation assertion (reference rc_rl.py:34-80)."""
    r1 = np.asarray(rep_fn(params, inputs))
    r2 = np.asarray(rep_fn(params, inputs))
    assert np.array_equal(r1, r2), "representations are not deterministic"


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


def run_rep_rl_exp(path, policy, params, env, rollout_fn: Callable, cfg,
                   key, rep_params: dict | None = None,
                   compare: tuple = ("cca",)) -> dict:
    """RL representation-change experiment (reference rc_rl.py:83-221):
    compare policy-body activations before/after inner-loop adaptation on
    the task's own query states."""
    from exploring_meta_tpu import rl as rl_mod

    rep_params = dict(rep_params or {"n_tasks": 5, "layers": [1, 2]})
    rep_path = os.path.join(path, "rep_exp")
    os.makedirs(rep_path, exist_ok=True)

    results = {m: {str(l): [] for l in rep_params["layers"]} for m in compare}

    for _ in range(rep_params["n_tasks"]):
        key, kt, ka, kq = jax.random.split(key, 4)
        task = env.sample_tasks(kt, 1)[0]
        adapted, _, _, _ = rl_mod.fast_adapt_trpo(policy, params, rollout_fn,
                                                  task, ka, cfg)
        query = rollout_fn(adapted, task, kq)
        states = query.flat(query.state)

        sanity_check(lambda p, x: policy.get_representation(p, x), params,
                     states)

        for layer in rep_params["layers"]:
            init_rep = policy.get_representation(params, states, layer)
            adapted_rep = policy.get_representation(adapted, states, layer)
            sims = _similarities(init_rep, adapted_rep, compare)
            for metric, value in sims.items():
                results[metric][str(layer)].append(float(value))

    for metric, per_layer in results.items():
        with open(os.path.join(rep_path, f"{metric}_rl_results.json"), "w") as f:
            json.dump(per_layer, f, sort_keys=True, indent=4)
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
