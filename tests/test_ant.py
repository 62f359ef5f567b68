"""Real-MuJoCo AntDirection execution tests.

gymnasium + mujoco ARE in this image; these verify the direction-reward
composition against l2l's AntDirection semantics
(``/root/reference/utils/env_maker.py:7,11-21``): forward reward =
velocity projected onto the task direction, plus Ant-v5's survival bonus
and minus control/contact costs.
"""

import os

import numpy as np
import jax
import pytest

from exploring_meta_tpu.envs.factory import make_env
from exploring_meta_tpu.envs.host import AntDirectionEnv


def _run_rewards(task, actions, seed=7):
    env = AntDirectionEnv(seed=0)
    env.set_task(task)
    env.reset(seed=seed)
    rewards = []
    for a in actions:
        _, r, done, _, _ = env.step(a)
        rewards.append(r)
        if done:
            break
    return np.asarray(rewards)


def test_ant_env_api_and_finite_steps():
    env = AntDirectionEnv(seed=0)
    assert env.obs_size == 105 and env.action_size == 8

    tasks = env.sample_tasks(None, 5)
    assert tasks.shape == (5, 2)
    np.testing.assert_allclose(np.linalg.norm(tasks, axis=1), 1.0, atol=1e-12)

    env.set_task(tasks[0])
    obs = env.reset(seed=1)
    assert obs.shape == (105,)
    rng = np.random.default_rng(0)
    for _ in range(20):
        obs, rew, done, truncated, suc = env.step(
            rng.uniform(-0.3, 0.3, size=8))
        assert np.all(np.isfinite(obs)) and np.isfinite(rew)
        assert suc == 0.0
        if done:
            break


def test_ant_direction_reward_flips_with_task():
    rng = np.random.default_rng(3)
    actions = rng.uniform(-0.4, 0.4, size=(15, 8))

    r_plus = _run_rewards(np.array([1.0, 0.0]), actions)
    r_minus = _run_rewards(np.array([-1.0, 0.0]), actions)
    r_plus2 = _run_rewards(np.array([1.0, 0.0]), actions)

    # Determinism: same seed + same actions => identical physics.
    np.testing.assert_array_equal(r_plus, r_plus2)
    n = min(len(r_plus), len(r_minus))
    # Identical physics => reward difference is exactly the forward term
    # flipping sign: r(+x) - r(-x) = 2 * x_velocity per step.
    diff = r_plus[:n] - r_minus[:n]
    assert np.any(np.abs(diff) > 1e-9), "direction must affect reward"
    # The non-directional terms (ctrl/contact/survive) cancel in the
    # difference, so the mean reward across both directions equals the
    # direction-free part; check it's finite and the two runs differ.
    assert not np.array_equal(r_plus[:n], r_minus[:n])

    # An orthogonal direction projects y-velocity instead.
    r_y = _run_rewards(np.array([0.0, 1.0]), actions)
    assert not np.array_equal(r_plus[: len(r_y)], r_y[: len(r_plus)])


def test_ant_through_factory_and_host_rollout():
    from exploring_meta_tpu.envs.host import make_host_rollout
    from exploring_meta_tpu.models import DiagNormalPolicy

    env, is_device = make_env("AntDirection-v1", workers=2, seed=0,
                              max_path_length=10)
    assert not is_device
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    roll = make_host_rollout(env, policy, horizon=10)
    task = env.sample_tasks(None, 1)[0]
    traj = roll(params, task, jax.random.key(1))
    assert traj.state.shape == (10, 2, 105)
    assert traj.action.shape == (10, 2, 8)
    assert np.all(np.isfinite(np.asarray(traj.reward)))
    # valid masks post-termination steps; first step always valid
    assert np.all(np.asarray(traj.valid)[0] == 1.0)


@pytest.mark.slow
def test_ant_anil_ppo_end_to_end(tmp_path):
    """One tiny ANIL-PPO AntDirection iteration + offline eval — the
    reference rl/anil_ppo.py --env AntDirection-v1 path on real MuJoCo."""
    from exploring_meta_tpu.analysis import eval_rl
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="AntDirection-v1", num_iterations=2,
                         meta_batch_size=2, adapt_batch_size=2,
                         max_path_length=15, adapt_steps=1, save_every=1,
                         n_eval_tasks=2, outer_lr=0.001, inner_lr=0.01,
                         seed=42)
    trainer = RLTrainer(cfg, algo="ppo", anil=True, path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert final["rewards_per_task"] == {}  # not a Meta-World env

    out = eval_rl.run(trainer.model_path, n_eval_tasks=2, run_rc=True)
    assert np.isfinite(out["eval"]["mean_reward"])
    assert len(out["eval"]["tasks_rewards"]) == 2
    # RC ran on real MuJoCo + checkpoint drift across the 2 checkpoints
    assert os.path.exists(os.path.join(trainer.model_path, "rep_exp",
                                       "cca_rl_results.json"))
    assert len(out["cca_through_time"]) == 1  # 2 checkpoints -> 1 pair
    assert os.path.exists(os.path.join(trainer.model_path,
                                       "cca_through_time.json"))


def test_ant_vec_env_slots_have_distinct_initial_states():
    """Regression: identical per-slot seeds put every episode's np_random
    in lockstep, collapsing initial-state diversity (MuJoCo reset noise).
    make_env must seed slots seed+i (gym AsyncVectorEnv semantics)."""
    env, is_device = make_env("AntDirection-v1", workers=3, seed=0)
    assert not is_device
    obs = [e.reset() for e in env.envs]
    assert not np.allclose(obs[0], obs[1])
    assert not np.allclose(obs[1], obs[2])
