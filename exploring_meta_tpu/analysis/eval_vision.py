"""Offline vision evaluation driver.

Rebuild of reference ``misc_scripts/eval_vision.py``: given a run
directory (the artifact contract of utils/experiment.py), reload the
config from ``logger.json``, rebuild the model, and run

- a per-checkpoint meta-test accuracy sweep -> ``ckpnt_results.json``;
- final meta-test accuracy;
- optionally the CL and representation-change experiments.
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax

from exploring_meta_tpu import adapt, models, tasks
from exploring_meta_tpu.analysis.cl import run_cl_exp
from exploring_meta_tpu.analysis.rc import run_rep_exp
from exploring_meta_tpu.utils.experiment import load_params


def _spec_from_config(config: dict, anil: bool):
    ways = config["ways"]
    if config["dataset"] == "omni":
        return (models.anil_omniglot_spec(ways) if anil
                else models.omniglot_spec(ways))
    return (models.anil_mini_imagenet_spec(ways) if anil
            else models.mini_imagenet_spec(ways))


def run(base_path: str, n_eval_batches: int = 20, run_cl: bool = True,
        run_rc: bool = True, cl_params: dict | None = None,
        rep_params: dict | None = None, synthetic: bool | None = None) -> dict:
    with open(os.path.join(base_path, "logger.json")) as f:
        config = json.load(f)["config"]
    anil = config["algo"].startswith("anil")
    spec = _spec_from_config(config, anil)

    template = models.init_cnn4(jax.random.key(0), spec)
    params = load_params(os.path.join(base_path, "model.npz"), template)

    _, _, test_ds = tasks.get_dataset(
        config["dataset"], seed=config["seed"],
        synthetic=synthetic if synthetic is not None
        else config.get("synthetic") or None)

    fast_adapt = adapt.make_vision_fast_adapt(
        spec, inner_lr=config["inner_lr"], adapt_steps=config["adapt_steps"],
        shots=config["shots"], ways=config["ways"], anil=anil)
    meta_eval = adapt.make_meta_eval(fast_adapt)

    key = jax.random.key(config["seed"] + 1)

    # Per-checkpoint accuracy sweep (reference eval_vision.py:79-88).
    from exploring_meta_tpu.utils.experiment import list_checkpoints
    ckpt_results = {}
    for step, path in list_checkpoints(base_path):
        ck_params = load_params(path, template)
        key, k = jax.random.split(key)
        data, labels = tasks.sample_task_batch(
            k, test_ds, config["ways"], config["shots"],
            config["meta_batch_size"])
        res = meta_eval(ck_params, data, labels)
        ckpt_results[step] = float(res["metric"])
    with open(os.path.join(base_path, "ckpnt_results.json"), "w") as f:
        json.dump(ckpt_results, f, sort_keys=True, indent=4)

    # Final meta-test over n_eval_batches meta-batches.
    accs = []
    for _ in range(n_eval_batches):
        key, k = jax.random.split(key)
        data, labels = tasks.sample_task_batch(
            k, test_ds, config["ways"], config["shots"],
            config["meta_batch_size"])
        accs.append(float(meta_eval(params, data, labels)["metric"]))
    test_acc = sum(accs) / len(accs)
    print("Meta Test Accuracy", test_acc)

    out = {"test_acc": test_acc, "ckpnt_results": ckpt_results}

    apply_fn = lambda p, x: models.cnn4_apply(p, spec, x)
    if run_cl:
        key, k = jax.random.split(key)
        anil_kwargs = {}
        if anil:  # head-only adaptation on frozen features
            anil_kwargs = dict(
                features_fn=lambda p, x: models.cnn4_features(p, spec, x),
                head_apply=models.cnn4_head_apply)
        _, cl_res = run_cl_exp(base_path, apply_fn, params, test_ds,
                               config["ways"], config["shots"], k,
                               cl_params=cl_params, **anil_kwargs)
        out["cl_res"] = cl_res
    if run_rc:
        key, k = jax.random.split(key)
        rep_fn = lambda p, x, layer: models.get_rep_layer(p, spec, x, layer)
        out["rep_res"] = run_rep_exp(base_path, apply_fn, rep_fn, params,
                                     test_ds, config["ways"],
                                     config["shots"], k,
                                     rep_params=rep_params)

        # Representation drift across training checkpoints (reference
        # rc_rl.py:295-353 measure_change_through_time).
        ckpt_paths = [path for _, path in list_checkpoints(base_path)]
        if len(ckpt_paths) >= 2:
            from exploring_meta_tpu.analysis.rc import (
                measure_change_through_time)
            key, k = jax.random.split(key)
            probe, _ = tasks.sample_task_batch(k, test_ds, config["ways"],
                                               config["shots"], 1)
            probe = probe[0]
            ckpt_params = [load_params(p, template) for p in ckpt_paths]
            out["cca_through_time"] = measure_change_through_time(
                base_path, ckpt_params,
                lambda p, x: models.cnn4_features(p, spec, x), probe)

    with open(os.path.join(base_path, "eval_results.json"), "w") as f:
        json.dump(out, f, sort_keys=True, indent=4, default=str)
    return out
