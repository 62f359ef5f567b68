"""Offline RL evaluation driver.

Rebuild of reference ``misc_scripts/eval_rl.py``: reload a trained policy
from a run directory, then run meta-test evaluation and optionally the CL
and representation-change experiments on fresh tasks.

Routes through ``envs.factory.make_env`` so device (Particles2D), MuJoCo
(AntDirection) and Meta-World run dirs all evaluate; supports the
reference's eval switches — ``test_on_train`` (eval on the benchmark's
TRAIN tasks, eval_rl.py:32), ``each3`` (3 trials per distinct task,
:33), an explicit named task (:46-49), and checkpoint selection
(:29,126-139) — and writes the per-task-name reward artifacts + ML10 bar
plots (:170-179).
"""

from __future__ import annotations

import json
import os

import jax

from exploring_meta_tpu import rl
from exploring_meta_tpu.analysis.cl import run_cl_rl_exp
from exploring_meta_tpu.analysis.rc import run_rep_rl_exp
from exploring_meta_tpu.envs.factory import make_env
from exploring_meta_tpu.trainers.rl import build_policy
from exploring_meta_tpu.utils.experiment import load_params
from exploring_meta_tpu.utils.plotter import (
    bar_plot_ml10, bar_plot_ml10_one_task,
)


def _checkpoint_path(base_path: str, checkpoint: int | None) -> str:
    """model.npz, or model_checkpoints/model_<N>.npz when a checkpoint
    number is chosen (reference eval_rl.py:126-139)."""
    if checkpoint is None:
        return os.path.join(base_path, "model.npz")
    return os.path.join(base_path, "model_checkpoints",
                        f"model_{checkpoint}.npz")


def run(base_path: str, run_eval: bool = True, run_cl: bool = False,
        run_rc: bool = False, n_eval_tasks: int | str | None = None,
        each3: bool = False, test_on_train: bool = False,
        checkpoint: int | None = None, workers: int | None = None,
        task_batch: bool = False) -> dict:
    """Evaluate a run directory. ``n_eval_tasks`` may be an int (sample
    that many tasks) or a task name string (explicit single ML10 task,
    reference eval_params['n_tasks'] comment at eval_rl.py:46-49).
    ``task_batch`` evaluates all selected tasks in lockstep through one
    big vec env (host envs; see rl/host_batched.py)."""
    with open(os.path.join(base_path, "logger.json")) as f:
        config = json.load(f)["config"]
    anil = config["algo"].startswith("anil")
    algo = config["algo"].split("_")[-1]
    env_name = config["dataset"]  # dataset field holds env name
    extra_info = env_name.startswith("ML")
    seed = config["seed"]

    cfg = rl.RLConfig(
        inner_lr=config["inner_lr"], gamma=config["gamma"],
        tau=config["tau"], adapt_steps=config["adapt_steps"],
        adapt_batch_size=config["adapt_batch_size"],
        max_path_length=config["max_path_length"],
        ppo_epochs=config.get("ppo_epochs", 3),
        ppo_clip_ratio=config.get("ppo_clip_ratio", 0.3), anil=anil)

    # Meta-test env: test split unless test_on_train (reference rl.py:153).
    env, is_device = make_env(env_name,
                              workers=workers or cfg.adapt_batch_size,
                              seed=seed, test=(not test_on_train),
                              max_path_length=cfg.max_path_length)
    policy = build_policy(env, anil, fc_neurons=config.get("fc_neurons", 100),
                          activation=config.get("activation", "relu"))
    template = policy.init(jax.random.key(0))
    params = load_params(_checkpoint_path(base_path, checkpoint), template)

    if is_device:
        roll = rl.make_rollout(env, policy.sample,
                               episodes=cfg.adapt_batch_size,
                               horizon=cfg.max_path_length)
    else:
        from exploring_meta_tpu.envs.host import make_host_rollout
        roll = make_host_rollout(env, policy, cfg.max_path_length)

    key = jax.random.key(seed + 1)
    out = {}
    grouped_roll_factory = None
    if task_batch and not is_device:
        from exploring_meta_tpu.envs.host import make_grouped_roll_factory
        # Memoized per n_tasks: the eval/CL/RC sections share one big env.
        grouped_roll_factory = make_grouped_roll_factory(
            env_name, policy, cfg, seed, test=(not test_on_train))

    if run_eval:
        key, k = jax.random.split(key)
        n_tasks = n_eval_tasks if n_eval_tasks is not None else config.get(
            "n_eval_tasks", 10)
        out["eval"] = rl.evaluate(
            algo, policy, params, env, roll, cfg, n_tasks=n_tasks, key=k,
            device_env=is_device, each3=each3, test_on_train=test_on_train,
            extra_info=extra_info,
            task_batch=task_batch and not is_device,
            grouped_roll_factory=grouped_roll_factory)
        print("Final evaluation:", out["eval"]["mean_reward"],
              "success:", out["eval"]["mean_success"])

        res_per_task = out["eval"]["rewards_per_task"]
        if res_per_task:
            # Reference artifact contract (eval_rl.py:170-179): per-task
            # json + ML10 bar plot, named <algo>_<train|test>_<seed>.
            t_test = "train" if test_on_train else "test"
            stem = f"{config['algo']}_{t_test}_{seed}"
            with open(os.path.join(base_path, f"{stem}.json"), "w") as f:
                json.dump(res_per_task, f)
            bar_plot_ml10(res_per_task,
                          os.path.join(base_path, f"{stem}.png"))
            if isinstance(n_tasks, str):
                bar_plot_ml10_one_task(
                    res_per_task,
                    os.path.join(base_path, f"{stem}_{n_tasks}.png"))
    if run_cl:
        key, k = jax.random.split(key)
        _, cl_rew, cl_suc = run_cl_rl_exp(
            base_path, policy, params, env, roll, cfg, k, algo=algo,
            one_per_task=extra_info,
            grouped_roll_factory=grouped_roll_factory)
        out["cl_res_rew"], out["cl_res_suc"] = cl_rew, cl_suc
    if run_rc:
        key, k = jax.random.split(key)
        out["rep_res"] = run_rep_rl_exp(
            base_path, policy, params, env, roll, cfg, k, algo=algo,
            eval_each_task=extra_info,
            grouped_roll_factory=grouped_roll_factory)

        # Representation drift across training checkpoints on probe states
        # from one rollout (reference rc_rl.py:295-353
        # measure_change_through_time).
        from exploring_meta_tpu.analysis.rc import (
            measure_change_through_time, real_states,
        )
        from exploring_meta_tpu.utils.experiment import list_checkpoints
        ckpt_paths = [path for _, path in list_checkpoints(base_path)]
        if len(ckpt_paths) >= 2:
            key, kt, kr = jax.random.split(key, 3)
            probe_task = env.sample_tasks(kt, 1)[0]
            traj = roll(params, probe_task, kr)
            # real episode states only: post-termination filler rows are
            # frozen/zero and would bias the similarity statistics
            probe = real_states(traj)[:64]
            ckpt_params = [load_params(p, template) for p in ckpt_paths]
            out["cca_through_time"] = measure_change_through_time(
                base_path, ckpt_params,
                lambda p, x: policy.get_representation(p, x), probe)

    with open(os.path.join(base_path, "eval_results.json"), "w") as f:
        json.dump(out, f, sort_keys=True, indent=4, default=str)
    return out
