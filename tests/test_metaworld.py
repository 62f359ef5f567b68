"""Meta-World adapter conformance tests against the fake metaworld module.

The real package is uninstallable in this image, so these drive
``envs/metaworld_adapter.py`` through the full task-sampling / set_task /
reset / step / horizon-done surface with ``tests/fake_metaworld.py``
standing in — behavior to match is the reference wrapper
(``/root/reference/utils/metaworld_wrapper.py:30-53``).
"""

import json
import os

import numpy as np
import jax
import pytest

from exploring_meta_tpu.envs.factory import make_env
from exploring_meta_tpu.rl.evaluate import (
    ML10_EVAL_TASK_NAMES, ML10_TRAIN_TASK_NAMES,
)


def _ml10(fake, **kw):
    from exploring_meta_tpu.envs.metaworld_adapter import MetaWorldEnv
    return MetaWorldEnv("ML10", **kw)


def test_adapter_task_api(fake_metaworld):
    env = _ml10(fake_metaworld, seed=0)
    assert env.obs_size == 9 and env.action_size == 4

    tasks = env.sample_tasks(None, 12)
    assert len(tasks) == 12
    for t in tasks:
        assert set(t) == {"task", "mw_task"}
        assert 0 <= t["task"] < 10  # train split: ids index the train table
        # the id must agree with the class the task pins
        assert t["mw_task"].env_name == ML10_TRAIN_TASK_NAMES[t["task"]]

    env.set_task(tasks[0])
    obs = env.reset(seed=3)
    assert obs.shape == (9,) and obs.dtype == np.float32
    # set_task routed to the class matching the task's env_name
    assert type(env._env).__name__ == tasks[0]["mw_task"].env_name


def test_adapter_test_split_ids(fake_metaworld):
    env = _ml10(fake_metaworld, seed=0, test=True)
    tasks = env.sample_tasks(None, 20)
    for t in tasks:
        assert 0 <= t["task"] < 5
        assert t["mw_task"].env_name == ML10_EVAL_TASK_NAMES[t["task"]]


def test_adapter_horizon_done_and_success_stripping(fake_metaworld):
    env = _ml10(fake_metaworld, seed=0, max_path_length=5)
    task = env.sample_tasks(None, 1)[0]
    env.set_task(task)
    env.reset(seed=1)
    for t in range(5):
        obs, rew, done, truncated, suc = env.step(np.zeros(4))
        assert obs.dtype == np.float32 and np.isfinite(rew)
        assert isinstance(suc, float)  # info stripped to the success flag
        # fake env never terminates on its own -> done only via horizon
        assert done == (t == 4)

    # set/get_max_path_length parity (reference metaworld_wrapper.py:49-53)
    env.set_max_path_length(7)
    assert env.get_max_path_length() == 7


def test_adapter_clamps_actions_to_space(fake_metaworld):
    """ActionSpaceScaler parity (reference env_maker.py:39): the physics
    must see actions clamped to the action-space bounds, not the raw
    Gaussian sample."""
    env = _ml10(fake_metaworld, seed=0)
    env.set_task(env.sample_tasks(None, 1)[0])
    env.reset(seed=1)
    env.step(np.full(env.action_size, 5.0))
    assert np.all(np.abs(env._env.last_action) <= 1.0)
    env.step(np.full(env.action_size, -3.0))
    assert np.all(env._env.last_action == -1.0)


def test_adapter_success_flag(fake_metaworld):
    env = _ml10(fake_metaworld, seed=0)
    task = env.sample_tasks(None, 1)[0]
    # Pin the goal onto the (near-origin) start state: first step succeeds.
    task["mw_task"].data = np.zeros(9)
    env.set_task(task)
    env.reset(seed=0)
    _, _, _, _, suc = env.step(np.zeros(4))
    assert suc == 1.0


def test_make_env_ml10_hostvec_rollout(fake_metaworld):
    from exploring_meta_tpu.envs.host import make_host_rollout
    from exploring_meta_tpu.models import DiagNormalPolicy

    env, is_device = make_env("ML10", workers=2, seed=0, max_path_length=6)
    assert not is_device and env.n_envs == 2

    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    roll = make_host_rollout(env, policy, horizon=6)

    task = env.sample_tasks(None, 1)[0]
    traj = roll(params, task, jax.random.key(1))
    assert traj.state.shape == (6, 2, 9)
    assert traj.action.shape == (6, 2, 4)
    # fake env never self-terminates: every step valid, last step done
    assert np.all(np.asarray(traj.valid) == 1.0)
    assert np.all(np.asarray(traj.done)[-1] == 1.0)
    assert np.all(np.isfinite(np.asarray(traj.reward)))


def test_make_env_ml45_routing_and_shared_benchmark(fake_metaworld):
    """ML45 routes like ML10, and every vec-env slot shares ONE benchmark
    object (the factory builds it once — benchmark construction parses
    every class's task pickles, minutes for real ML45 x workers)."""
    env, is_device = make_env("ML45", workers=3, seed=0, max_path_length=5)
    assert not is_device and env.n_envs == 3
    assert env.envs[0].obs_size == env.obs_size
    benches = {id(e._bench) for e in env.envs}
    assert len(benches) == 1, "slots built separate benchmarks"
    # 45 train classes on the train split
    assert len(env.envs[0]._class_names) == 45
    tasks = env.sample_tasks(None, 4)
    assert all(0 <= t["task"] < 45 for t in tasks)
    env.set_task(tasks[0])


def test_make_env_ml1_routing(fake_metaworld):
    env, is_device = make_env("ML1_push", workers=1, seed=0,
                              max_path_length=4)
    assert not is_device
    t = env.sample_tasks(None, 3)
    assert all(x["mw_task"].env_name == "push" for x in t)


@pytest.mark.slow
def test_ml10_train_and_eval_end_to_end(fake_metaworld, tmp_path):
    """Tiny MAML-TRPO run on fake ML10 + full offline eval: each3 task
    grouping, per-task-name artifacts, bar plots, checkpoint selection,
    test_on_train — the reference eval_rl flow (misc_scripts/eval_rl.py)."""
    from exploring_meta_tpu.analysis import eval_rl
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="ML10", num_iterations=2, meta_batch_size=2,
                         adapt_batch_size=2, max_path_length=6,
                         adapt_steps=1, save_every=1, n_eval_tasks=2,
                         seed=42)
    trainer = RLTrainer(cfg, algo="trpo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    # final meta-test ran on the TEST split -> eval-table names
    assert set(final["rewards_per_task"]) <= set(
        ML10_EVAL_TASK_NAMES.values())

    run_dir = trainer.model_path
    assert os.path.exists(os.path.join(run_dir, "model.npz"))

    # -- each3 on the test split ------------------------------------------
    out = eval_rl.run(run_dir, each3=True)
    rpt = out["eval"]["rewards_per_task"]
    assert set(rpt) == set(ML10_EVAL_TASK_NAMES.values())
    for pairs in rpt.values():  # 3 trials x (reward, success) per task
        assert len(pairs) == 6
    stem = os.path.join(run_dir, "maml_trpo_test_42")
    assert os.path.exists(stem + ".json") and os.path.exists(stem + ".png")
    with open(stem + ".json") as f:
        assert set(json.load(f)) == set(ML10_EVAL_TASK_NAMES.values())

    # -- test_on_train: train-table names, train-split artifacts -----------
    out = eval_rl.run(run_dir, n_eval_tasks=3, test_on_train=True)
    assert set(out["eval"]["rewards_per_task"]) <= set(
        ML10_TRAIN_TASK_NAMES.values())
    assert os.path.exists(os.path.join(run_dir, "maml_trpo_train_42.json"))

    # -- explicit named task + one-task bar plot ----------------------------
    out = eval_rl.run(run_dir, n_eval_tasks="door-close")
    assert list(out["eval"]["rewards_per_task"]) == ["door-close"]
    assert os.path.exists(
        os.path.join(run_dir, "maml_trpo_test_42_door-close.png"))

    # -- checkpoint selection ----------------------------------------------
    out = eval_rl.run(run_dir, n_eval_tasks=2, checkpoint=0)
    assert np.isfinite(out["eval"]["mean_reward"])


@pytest.mark.slow
def test_ml10_trpo_mesh_sharded_outer_step(fake_metaworld, tmp_path,
                                           eight_devices):
    """Host-env (fake ML10) rollouts feeding the mesh-sharded TRPO outer
    step: --mesh 4 on the 8-virtual-device CPU backend."""
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="ML10", num_iterations=2, meta_batch_size=4,
                         adapt_batch_size=2, max_path_length=5,
                         adapt_steps=1, save_every=5, n_eval_tasks=2,
                         seed=42, mesh=4)
    trainer = RLTrainer(cfg, algo="trpo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["meta_loss"]) == 2


@pytest.mark.slow
def test_ml10_cl_and_rc_host(fake_metaworld, tmp_path):
    """Host-env CL + RC experiments drive the eager branches end-to-end
    (reference cl_rl.py / rc_rl.py run on ML10)."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.analysis.cl import run_cl_rl_exp
    from exploring_meta_tpu.analysis.rc import run_rep_rl_exp
    from exploring_meta_tpu.envs.host import make_host_rollout
    from exploring_meta_tpu.models import DiagNormalPolicy

    env, _ = make_env("ML10", workers=2, seed=0, max_path_length=5)
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(adapt_steps=1, adapt_batch_size=2, max_path_length=5)
    roll = make_host_rollout(env, policy, horizon=5)

    rew_m, cl_rew, cl_suc = run_cl_rl_exp(str(tmp_path), policy, params, env,
                                          roll, cfg, jax.random.key(1),
                                          n_tasks=3)
    assert rew_m.shape == (3, 3) and np.all(np.isfinite(rew_m))
    assert "av_acc" in cl_rew
    assert os.path.exists(tmp_path / "cl_exp" / "cl_rew_matrix.out")
    assert os.path.exists(tmp_path / "cl_exp" / "cl_params.json")
    # host envs record per-step adaptation progress (cl_rl.py:59-91)
    with open(tmp_path / "cl_exp" / "adapt_progress.json") as f:
        prog = json.load(f)
    assert set(prog) == {"reward", "success"}
    assert set(prog["reward"]) == {"task_1", "task_2", "task_3"}
    assert set(prog["reward"]["task_1"]) == {"step_0"}

    # one_per_task: the ML10 train split has 10 distinct tasks -> 10x10
    rew_m2, _, _ = run_cl_rl_exp(str(tmp_path), policy, params, env, roll,
                                 cfg, jax.random.key(3), one_per_task=True)
    assert rew_m2.shape == (10, 10)

    res = run_rep_rl_exp(str(tmp_path), policy, params, env, roll, cfg,
                         jax.random.key(2),
                         rep_params={"n_tasks": 2, "layers": [1, 2]})
    assert set(res["cca"]) == {"1", "2"}
    assert all(len(v) == 2 for v in res["cca"].values())
    # reference across-steps tracking: one entry per (task, adapt step)
    assert len(res["across_steps"]["init_mean"]) == 2 * cfg.adapt_steps
    assert all(0.0 <= v <= 1.0 + 1e-6
               for v in res["across_steps"]["init_mean"])
    assert set(res["av_layer_changes"]["mean"]) == {"1", "2"}
    for art in ("rep_params.json", "rep_extra.json",
                "layer_changes_average.png"):
        assert os.path.exists(tmp_path / "rep_exp" / art)


@pytest.mark.slow
def test_ml10_rc_eval_each_task(fake_metaworld, tmp_path):
    """eval_each_task=True: 3 trials per distinct ML10 test task (the
    reference rep_params['eval_each_task'] mode, rc_rl.py:106-109)."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.analysis.rc import run_rep_rl_exp
    from exploring_meta_tpu.envs.host import make_host_rollout
    from exploring_meta_tpu.models import DiagNormalPolicy

    env, _ = make_env("ML10", workers=2, seed=0, max_path_length=4,
                      test=True)
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(adapt_steps=1, adapt_batch_size=2, max_path_length=4)
    roll = make_host_rollout(env, policy, horizon=4)

    res = run_rep_rl_exp(str(tmp_path), policy, params, env, roll, cfg,
                         jax.random.key(1),
                         rep_params={"n_tasks": 1, "layers": [1]},
                         eval_each_task=True)
    # 5 distinct test tasks x 3 trials each
    assert len(res["cca"]["1"]) == 15


@pytest.mark.slow
def test_ml10_task_batched_training(fake_metaworld, tmp_path):
    """--task_batch on a host env: the whole meta-batch collects through
    one meta_batch*episodes vec env; trainer contract preserved."""
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="ML10", num_iterations=2, meta_batch_size=2,
                         adapt_batch_size=2, max_path_length=6,
                         adapt_steps=1, save_every=2, n_eval_tasks=2,
                         seed=7, task_batch=True)
    trainer = RLTrainer(cfg, algo="ppo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["adapt_reward"]) == 2
    assert len(trainer.metrics["meta_loss"]) == 2


def test_ml10_meta_test_task_batched(fake_metaworld):
    """meta_test(task_batch=True) on fake ML10: lockstep adaptation +
    evaluation, per-task-name rewards preserved."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.models import DiagNormalPolicy

    env, _ = make_env("ML10", workers=1, seed=0, max_path_length=4)
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size, hiddens=(8, 8))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                      max_path_length=4)
    out = rl.meta_test("ppo", "ML10", policy, params, cfg, n_tasks=3,
                       key=jax.random.key(1), seed=0, task_batch=True)
    assert len(out["tasks_rewards"]) == 3
    assert np.isfinite(out["mean_reward"])
    assert out["rewards_per_task"]
    assert set(out["rewards_per_task"]) <= set(ML10_EVAL_TASK_NAMES.values())
