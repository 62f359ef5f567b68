"""Offline RL evaluation driver.

Rebuild of reference ``misc_scripts/eval_rl.py``: reload a trained policy
from a run directory, then run meta-test evaluation and optionally the CL
and representation-change experiments on fresh tasks.
"""

from __future__ import annotations

import json
import os

import jax

from exploring_meta_tpu import rl
from exploring_meta_tpu.analysis.cl import run_cl_rl_exp
from exploring_meta_tpu.analysis.rc import run_rep_rl_exp
from exploring_meta_tpu.trainers.rl import build_policy, make_device_env
from exploring_meta_tpu.utils.experiment import load_params


def run(base_path: str, run_eval: bool = True, run_cl: bool = False,
        run_rc: bool = False, n_eval_tasks: int | None = None) -> dict:
    with open(os.path.join(base_path, "logger.json")) as f:
        config = json.load(f)["config"]
    anil = config["algo"].startswith("anil")
    algo = config["algo"].split("_")[-1]

    env = make_device_env(config["dataset"])  # dataset field holds env name
    policy = build_policy(env, anil)
    template = policy.init(jax.random.key(0))
    params = load_params(os.path.join(base_path, "model.npz"), template)

    cfg = rl.RLConfig(
        inner_lr=config["inner_lr"], gamma=config["gamma"],
        tau=config["tau"], adapt_steps=config["adapt_steps"],
        adapt_batch_size=config["adapt_batch_size"],
        max_path_length=config["max_path_length"],
        ppo_epochs=config.get("ppo_epochs", 3),
        ppo_clip_ratio=config.get("ppo_clip_ratio", 0.3), anil=anil)
    roll = rl.make_rollout(env, policy.sample,
                           episodes=cfg.adapt_batch_size,
                           horizon=cfg.max_path_length)

    key = jax.random.key(config["seed"] + 1)
    out = {}
    if run_eval:
        key, k = jax.random.split(key)
        out["eval"] = rl.evaluate(
            algo, policy, params, env, roll, cfg,
            n_tasks=n_eval_tasks or config.get("n_eval_tasks", 10), key=k)
        print("Final evaluation:", out["eval"]["mean_reward"],
              "success:", out["eval"]["mean_success"])
    if run_cl:
        key, k = jax.random.split(key)
        _, cl_rew, cl_suc = run_cl_rl_exp(base_path, policy, params, env,
                                          roll, cfg, k, algo=algo)
        out["cl_res_rew"], out["cl_res_suc"] = cl_rew, cl_suc
    if run_rc:
        key, k = jax.random.split(key)
        out["rep_res"] = run_rep_rl_exp(base_path, policy, params, env,
                                        roll, cfg, k)

    with open(os.path.join(base_path, "eval_results.json"), "w") as f:
        json.dump(out, f, sort_keys=True, indent=4, default=str)
    return out
