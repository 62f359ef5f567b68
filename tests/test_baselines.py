"""Non-meta RL baseline tests: learning curves + host-env routing.

Reference counterparts: ``baselines/ppo.py`` / ``trpo.py`` / ``random.py``
train on whatever ``make_env`` yields (multitask Meta-World included,
``baselines/ppo.py:42-48``) — so the baselines must run on device envs
(Particles2D) AND host envs (MuJoCo Ant, Meta-World).
"""

import os

import numpy as np
import pytest

from exploring_meta_tpu.utils.config import RLScriptConfig


@pytest.mark.slow
def test_ppo_baseline_learns_particles(tmp_path):
    """Learning-curve check: returns improve over training (deterministic
    for a fixed seed; empirically first5=-9.9 -> last5=-8.2 at seed 1)."""
    from exploring_meta_tpu.trainers.baselines import PPOBaseline

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=40,
                         meta_batch_size=4, adapt_batch_size=8,
                         max_path_length=20, outer_lr=0.003, inner_lr=0.05,
                         adapt_steps=1, save_every=100, n_eval_tasks=4,
                         seed=1)
    b = PPOBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    rets = b.metrics["average_return"]
    assert len(rets) == 40
    assert np.mean(rets[-10:]) > np.mean(rets[:10]), (
        f"PPO baseline failed to improve: {np.mean(rets[:10])} -> "
        f"{np.mean(rets[-10:])}")
    assert np.isfinite(final["mean_reward"])
    assert os.path.exists(os.path.join(b.model_path, "model.npz"))
    assert os.path.exists(os.path.join(b.model_path, "metrics.json"))


@pytest.mark.slow
def test_trpo_baseline_device_smoke(tmp_path):
    from exploring_meta_tpu.trainers.baselines import TRPOBaseline

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=3,
                         meta_batch_size=2, adapt_batch_size=4,
                         max_path_length=15, save_every=2, n_eval_tasks=2,
                         seed=0)
    b = TRPOBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    assert np.isfinite(final["mean_reward"])
    assert all(np.isfinite(r) for r in b.metrics["average_return"])


@pytest.mark.slow
def test_ppo_baseline_host_ml10(fake_metaworld, tmp_path):
    """Reference baselines/ppo.py trains on multitask ML10 via make_env —
    the host-env path the round-1 baselines could not take."""
    from exploring_meta_tpu.rl.evaluate import ML10_EVAL_TASK_NAMES
    from exploring_meta_tpu.trainers.baselines import PPOBaseline

    cfg = RLScriptConfig(env="ML10", num_iterations=2, meta_batch_size=2,
                         adapt_batch_size=2, max_path_length=6,
                         save_every=1, n_eval_tasks=2, seed=42)
    b = PPOBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    assert np.isfinite(final["mean_reward"])
    # final meta-test ran on the ML10 TEST split with per-task-name output
    assert set(final["rewards_per_task"]) <= set(
        ML10_EVAL_TASK_NAMES.values())
    assert len(b.metrics["average_return"]) == 2


@pytest.mark.slow
def test_trpo_baseline_host_ml10(fake_metaworld, tmp_path):
    from exploring_meta_tpu.trainers.baselines import TRPOBaseline

    cfg = RLScriptConfig(env="ML10", num_iterations=2, meta_batch_size=2,
                         adapt_batch_size=2, max_path_length=6,
                         save_every=1, n_eval_tasks=2, seed=42)
    b = TRPOBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    assert np.isfinite(final["mean_reward"])


@pytest.mark.slow
def test_random_baseline_host_ant(tmp_path):
    """Random-policy control on real MuJoCo Ant (reference
    baselines/random.py evaluates an untrained policy with few-step
    adaptation)."""
    from exploring_meta_tpu.trainers.baselines import RandomPolicyBaseline

    cfg = RLScriptConfig(env="AntDirection-v1", num_iterations=0,
                         meta_batch_size=1, adapt_batch_size=2,
                         max_path_length=10, adapt_steps=1, inner_lr=0.01,
                         n_eval_tasks=2, seed=0)
    b = RandomPolicyBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    assert np.isfinite(final["mean_reward"])
    assert len(final["tasks_rewards"]) == 2


@pytest.mark.slow
def test_random_baseline_training_loop_artifacts(tmp_path):
    """The reference random baseline RUNS a training loop (random.py:73-110):
    per-iteration average_return metrics, policy + baseline checkpoints on
    the save_every cadence, then a PPO-adapt meta-test (:112-115)."""
    import json
    import glob
    from exploring_meta_tpu.trainers.baselines import RandomPolicyBaseline

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=3,
                         meta_batch_size=2, adapt_batch_size=2,
                         max_path_length=5, save_every=2, adapt_steps=1,
                         inner_lr=0.05, n_eval_tasks=2, seed=0)
    b = RandomPolicyBaseline(cfg, path=str(tmp_path) + "/")
    final = b.run()
    assert np.isfinite(final["mean_reward"])
    with open(os.path.join(b.model_path, "metrics.json")) as f:
        metrics = json.load(f)
    assert len(metrics["average_return"]) == 3
    assert "test_reward" in metrics
    ckpts = sorted(glob.glob(os.path.join(b.model_path, "model_checkpoints",
                                          "model_*.npz")))
    bl = sorted(glob.glob(os.path.join(b.model_path, "model_checkpoints",
                                       "baseline_*.npz")))
    assert len(ckpts) == 2 and len(bl) == 2  # iterations 0 and 2
    assert os.path.exists(os.path.join(b.model_path, "baseline.npz"))
