"""Fused meta-RL training tests (rl/train_scan.py + trainer --fuse)."""

import os

import numpy as np
import jax
import pytest

from exploring_meta_tpu import rl
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy


def _setup(horizon=10, episodes=2):
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=episodes,
                      max_path_length=horizon)
    roll = rl.make_rollout(env, policy.sample, episodes=episodes,
                           horizon=horizon)
    return env, policy, params, cfg, roll


@pytest.mark.slow
def test_trpo_train_scan_shapes_and_finiteness():
    env, policy, params, cfg, roll = _setup()
    trpo_cfg = rl.TRPOConfig()
    train = rl.make_trpo_train_scan(env, policy, roll, cfg, trpo_cfg,
                                    meta_batch_size=3, n_steps=4)
    new_params, ms = train(params, jax.random.key(1))
    assert ms["meta_loss"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(ms["adapt_reward"])))
    # params must actually move
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(new_params)))
    assert moved


@pytest.mark.slow
def test_adam_train_scan_matches_per_iteration_structure():
    import optax
    env, policy, params, cfg, roll = _setup()
    opt = optax.adam(0.01)
    train = rl.make_adam_train_scan(env, policy, roll, cfg, opt, "ppo",
                                    meta_batch_size=2, n_steps=3)
    new_params, opt_state, ms = train(params, opt.init(params),
                                      jax.random.key(2))
    assert set(ms) == {"meta_loss", "adapt_reward", "adapt_success"}
    assert ms["meta_loss"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(ms["meta_loss"])))


@pytest.mark.slow
def test_rl_trainer_fused_device(tmp_path):
    """--fuse on a device env: per-iteration metrics, checkpoints at chunk
    boundaries, final meta-test — the full trainer contract."""
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=5,
                         meta_batch_size=2, adapt_batch_size=2,
                         max_path_length=10, save_every=4, n_eval_tasks=2,
                         seed=0, fuse=2)
    trainer = RLTrainer(cfg, algo="trpo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["adapt_reward"]) == 5
    assert len(trainer.metrics["meta_loss"]) == 5
    import glob
    assert glob.glob(os.path.join(trainer.model_path, "model_checkpoints",
                                  "*.npz"))


@pytest.mark.slow
def test_rl_trainer_mesh_plus_fuse(tmp_path, eight_devices):
    """--mesh 4 --fuse 2 together on a device env: every chunk is one
    task-DP-sharded XLA program; metrics/checkpoint contract preserved."""
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=4,
                         meta_batch_size=4, adapt_batch_size=2,
                         max_path_length=10, save_every=3, n_eval_tasks=2,
                         seed=0, fuse=2, mesh=4)
    trainer = RLTrainer(cfg, algo="trpo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["adapt_reward"]) == 4
    assert len(trainer.metrics["meta_loss"]) == 4
    import glob
    assert glob.glob(os.path.join(trainer.model_path, "model_checkpoints",
                                  "*.npz"))


@pytest.mark.slow
def test_rl_trainer_fused_ppo_learns(tmp_path):
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=6,
                         meta_batch_size=2, adapt_batch_size=4,
                         max_path_length=10, save_every=10, n_eval_tasks=2,
                         outer_lr=0.003, seed=0, fuse=3)
    trainer = RLTrainer(cfg, algo="ppo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["adapt_reward"]) == 6
