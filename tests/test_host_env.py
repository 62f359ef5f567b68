"""Host-env pipeline tests with a hermetic fake physics env (no MuJoCo):
HostVecEnv collection semantics + replay-based meta-gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import rl
from exploring_meta_tpu.envs.host import HostVecEnv, make_host_rollout
from exploring_meta_tpu.models import DiagNormalPolicy, DiagNormalPolicyANIL


class FakeHostEnv:
    """Deterministic little host env: 1D point chasing a goal, terminates
    when close; mimics the gymnasium-style step contract of envs/host.py."""

    obs_size = 2
    action_size = 1

    def __init__(self, seed=0):
        self._rng = np.random.default_rng(seed)
        self._task = np.array([0.5])
        self._x = 0.0
        self._t = 0

    def sample_tasks(self, key, n):
        return self._rng.uniform(-1, 1, size=(n, 1))

    def set_task(self, task):
        self._task = np.asarray(task).reshape(1)

    def reset(self, seed=None):
        self._x, self._t = 0.0, 0
        return np.array([self._x, self._task[0]], np.float32)

    def step(self, action):
        self._x += float(np.clip(action[0], -0.2, 0.2))
        self._t += 1
        dist = abs(self._x - self._task[0])
        done = dist < 0.05
        return (np.array([self._x, self._task[0]], np.float32),
                -dist, done, False, 1.0 if done else 0.0)


@pytest.fixture(scope="module")
def host_setup():
    vec = HostVecEnv(lambda: FakeHostEnv(), n_envs=3)
    policy = DiagNormalPolicy(input_size=2, output_size=1, hiddens=(16, 16))
    params = policy.init(jax.random.key(0))
    roll = make_host_rollout(vec, policy, horizon=12)
    return vec, policy, params, roll


class TestHostVecEnv:
    def test_trajectory_contract(self, host_setup):
        vec, policy, params, roll = host_setup
        task = vec.sample_tasks(None, 1)[0]
        traj = roll(params, task, jax.random.key(1))
        assert traj.state.shape == (12, 3, 2)
        assert traj.action.shape == (12, 3, 1)
        # horizon-done: last valid step terminal
        last_valid = np.asarray(traj.valid[-1]) > 0
        assert np.all(np.asarray(traj.done[-1])[last_valid] == 1.0)
        # post-done filler: zero rewards where invalid
        invalid = np.asarray(traj.valid) == 0
        np.testing.assert_allclose(np.asarray(traj.reward)[invalid], 0.0)

    def test_cpu_policy_device_matches(self, host_setup):
        """policy_device="cpu" commits params/key to the local CPU backend
        (envs/host.py _place_policy); on the CPU test backend the math is
        identical, so trajectories must match the default path exactly."""
        vec, policy, params, roll = host_setup
        roll_cpu = make_host_rollout(vec, policy, horizon=12,
                                     policy_device="cpu")
        task = vec.sample_tasks(None, 1)[0]
        t_dev = roll(params, task, jax.random.key(5))
        t_cpu = roll_cpu(params, task, jax.random.key(5))
        for a, b in zip(jax.tree_util.tree_leaves(t_dev),
                        jax.tree_util.tree_leaves(t_cpu)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_set_host_policy_device_validates(self):
        from exploring_meta_tpu.envs.host import set_host_policy_device
        with pytest.raises(ValueError):
            set_host_policy_device("tpu9")
        set_host_policy_device("cpu")
        set_host_policy_device("device")  # restore module default

    def test_within_episode_timesteps(self, host_setup):
        vec, policy, params, roll = host_setup
        task = vec.sample_tasks(None, 1)[0]
        traj = roll(params, task, jax.random.key(2))
        ts = np.asarray(traj.timestep)
        valid = np.asarray(traj.valid) > 0
        # while valid, timestep == row index (no mid-rollout resets)
        rows = np.arange(12)[:, None] * np.ones((1, 3), int)
        np.testing.assert_array_equal(ts[valid], rows[valid])

    @pytest.mark.slow
    def test_fast_adapt_on_host_env(self, host_setup):
        vec, policy, params, roll = host_setup
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=3,
                          max_path_length=12)
        task = vec.sample_tasks(None, 1)[0]
        adapted, loss, replay, m = rl.fast_adapt_trpo(
            policy, params, roll, task, jax.random.key(3), cfg)
        assert np.isfinite(float(loss))
        assert len(replay) == 2


class TestReplayMeta:
    def test_replay_rederive_matches_collection(self, host_setup):
        """Feeding recorded trajectories back through fast_adapt must
        reproduce the collection-time adapted params exactly."""
        vec, policy, params, roll = host_setup
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=2, adapt_batch_size=3,
                          max_path_length=12, ppo_epochs=2)
        task = vec.sample_tasks(None, 1)[0]

        store = []
        rec = rl.recording_rollout(roll, store)
        adapted_collect, loss_collect, _ = rl.fast_adapt_ppo(
            policy, params, rec, task, jax.random.key(4), cfg)

        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *store)
        feeder = rl.replay_feeder(stacked)
        adapted_replay, loss_replay, _ = rl.fast_adapt_ppo(
            policy, params, feeder, None, jax.random.key(99), cfg)

        np.testing.assert_allclose(float(loss_collect), float(loss_replay),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(adapted_collect),
                        jax.tree_util.tree_leaves(adapted_replay)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_replay_meta_gradient_finite_nonzero(self, host_setup):
        vec, policy, params, roll = host_setup
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=3,
                          max_path_length=12, ppo_epochs=1)
        replays = []
        key = jax.random.key(5)
        for i in range(2):
            key, k = jax.random.split(key)
            task = vec.sample_tasks(None, 1)[0]
            stacked, m = rl.collect_replays("ppo", policy, params, roll,
                                            task, k, cfg)
            replays.append(stacked)
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *replays)
        meta_loss = rl.make_replay_meta_loss("ppo", policy, cfg)
        g = jax.grad(meta_loss)(params, batched)
        total = sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    @pytest.mark.slow
    def test_anil_policy_on_host_env(self):
        vec = HostVecEnv(lambda: FakeHostEnv(), n_envs=2)
        policy = DiagNormalPolicyANIL(input_size=2, output_size=1,
                                      fc_neurons=100)
        params = policy.init(jax.random.key(0))
        roll = make_host_rollout(vec, policy, horizon=8)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                          max_path_length=8, ppo_epochs=1, anil=True)
        task = vec.sample_tasks(None, 1)[0]
        stacked, m = rl.collect_replays("ppo", policy, params, roll, task,
                                        jax.random.key(1), cfg)
        meta_loss = rl.make_replay_meta_loss("ppo", policy, cfg)
        g = jax.grad(meta_loss)(params, jax.tree_util.tree_map(
            lambda x: x[None], stacked))
        # outer grads reach the body through the query pass
        body_norm = sum(np.abs(np.asarray(l)).sum()
                        for l in jax.tree_util.tree_leaves(g["body"]))
        assert np.isfinite(body_norm) and body_norm > 0


class DictTaskEnv(FakeHostEnv):
    """Meta-World-shaped tasks: dicts with a 'task' id (for the each3 /
    explicit-task selection modes)."""

    def sample_tasks(self, key, n):
        ids = self._rng.integers(0, 5, size=n)
        return [{"task": int(i), "goal": float(self._rng.uniform(-1, 1))}
                for i in ids]

    def set_task(self, task):
        self._task = np.array([task["goal"]])


class TestEvalTaskSelection:
    def test_each3_covers_every_task_id(self):
        from exploring_meta_tpu.rl.evaluate import sample_3_from_each_task
        env = DictTaskEnv(seed=0)
        tasks = sample_3_from_each_task(env, None, pool=200, per_task=3)
        ids = [t["task"] for t in tasks]
        for tid in range(5):
            assert ids.count(tid) == 3

    def test_explicit_task_selection(self):
        from exploring_meta_tpu.rl.evaluate import sample_explicit_task
        env = DictTaskEnv(seed=0)
        # 'drawer-close' is ML10 train id 4
        t = sample_explicit_task(env, None, "drawer-close", pool=100)
        assert t is not None and t["task"] == 4

    @pytest.mark.slow
    def test_evaluate_each3_end_to_end(self):
        env = HostVecEnv(lambda: DictTaskEnv(seed=1), n_envs=2)
        # delegate dict-task sampling through the vec env
        policy = DiagNormalPolicy(input_size=2, output_size=1,
                                  hiddens=(8, 8))
        params = policy.init(jax.random.key(0))
        roll = make_host_rollout(env, policy, horizon=6)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                          max_path_length=6)
        out = rl.evaluate("vpg", policy, params, env, roll, cfg,
                          n_tasks=0, key=jax.random.key(2),
                          device_env=False, each3=True)
        assert len(out["tasks_rewards"]) == 15  # 5 ids x 3 trials
        assert np.isfinite(out["mean_reward"])


class TestTaskBatchedCollection:
    """Task-batched host collection (envs/host.py make_grouped_host_rollout
    + rl/host_batched.py): one policy round-trip per step for the WHOLE
    meta-batch."""

    N_TASKS, EPISODES, HORIZON = 3, 2, 8

    def _policies(self, zero_noise: bool = False):
        policy = DiagNormalPolicy(input_size=2, output_size=1,
                                  hiddens=(8, 8))
        params = policy.init(jax.random.key(0))
        if zero_noise:
            # clamp the exploration noise to the sigma floor (1e-6) so the
            # deterministic fake env produces comparable trajectories under
            # different key trees (rollout-equality only: with sigma this
            # small the importance ratios in the losses are degenerate)
            params = dict(params,
                          sigma=jnp.full_like(params["sigma"], -20.0))
        return policy, params

    def test_grouped_rollout_matches_per_task(self):
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        from exploring_meta_tpu.rl.host_batched import broadcast_params
        policy, params = self._policies(zero_noise=True)
        tasks = FakeHostEnv(seed=3).sample_tasks(None, self.N_TASKS)

        big = HostVecEnv(lambda: FakeHostEnv(), self.N_TASKS * self.EPISODES)
        grouped = make_grouped_host_rollout(big, policy, self.HORIZON,
                                            self.N_TASKS, self.EPISODES)
        batched = grouped(broadcast_params(params, self.N_TASKS), tasks,
                          jax.random.key(1))
        assert batched.state.shape == (self.N_TASKS, self.HORIZON,
                                       self.EPISODES, 2)

        small = HostVecEnv(lambda: FakeHostEnv(), self.EPISODES)
        roll = make_host_rollout(small, policy, self.HORIZON)
        for i in range(self.N_TASKS):
            ref = roll(params, tasks[i], jax.random.key(2))
            got = jax.tree_util.tree_map(lambda x: x[i], batched)
            for name in ("state", "action", "reward", "done", "valid",
                         "success"):
                np.testing.assert_allclose(
                    np.asarray(getattr(got, name)),
                    np.asarray(getattr(ref, name)), atol=1e-3,
                    err_msg=f"task {i} field {name}")

    @pytest.mark.slow
    def test_collect_feeds_trpo_meta_step(self):
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        from exploring_meta_tpu.rl.host_batched import collect_task_batched
        policy, params = self._policies()
        big = HostVecEnv(lambda: FakeHostEnv(), self.N_TASKS * self.EPISODES)
        grouped = make_grouped_host_rollout(big, policy, self.HORIZON,
                                            self.N_TASKS, self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=2, adapt_batch_size=2,
                          max_path_length=self.HORIZON)
        tasks = big.sample_tasks(None, self.N_TASKS)
        old, replays, m = collect_task_batched("trpo", policy, params,
                                               grouped, tasks,
                                               jax.random.key(4), cfg)
        assert replays.state.shape == (self.N_TASKS, 3, self.HORIZON,
                                       self.EPISODES, 2)
        assert np.isfinite(m["reward"])

        new_params, info = rl.meta_optimize_trpo(
            policy, params, old, replays, cfg, rl.TRPOConfig(outer_lr=0.05),
            adapt_steps=2)
        assert np.isfinite(float(info["old_loss"]))
        moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree_util.tree_leaves(params),
                                    jax.tree_util.tree_leaves(new_params)))
        assert moved or not bool(info["accepted"])

    @pytest.mark.slow
    def test_collect_feeds_ppo_replay_loss(self):
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        from exploring_meta_tpu.rl.host_batched import collect_task_batched
        from exploring_meta_tpu.rl.replay_meta import make_replay_meta_loss
        policy, params = self._policies()
        big = HostVecEnv(lambda: FakeHostEnv(), self.N_TASKS * self.EPISODES)
        grouped = make_grouped_host_rollout(big, policy, self.HORIZON,
                                            self.N_TASKS, self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                          max_path_length=self.HORIZON, ppo_epochs=2)
        tasks = big.sample_tasks(None, self.N_TASKS)
        _, replays, _ = collect_task_batched("ppo", policy, params, grouped,
                                             tasks, jax.random.key(5), cfg)
        meta_loss = make_replay_meta_loss("ppo", policy, cfg)
        loss, grads = jax.value_and_grad(meta_loss)(params, replays)
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads))
        assert gnorm > 0

    def test_evaluate_task_batched_matches_contract(self):
        """evaluate(task_batch=True) returns the standard metrics dict with
        one entry per selected task, via lockstep collection."""
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        policy, params = self._policies()
        env = HostVecEnv(lambda: FakeHostEnv(), self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1,
                          adapt_batch_size=self.EPISODES,
                          max_path_length=self.HORIZON)

        def factory(n):
            big = HostVecEnv(lambda: FakeHostEnv(), n * self.EPISODES)
            return make_grouped_host_rollout(big, policy, self.HORIZON, n,
                                             self.EPISODES)

        out = rl.evaluate("trpo", policy, params, env, None, cfg,
                          n_tasks=self.N_TASKS, key=jax.random.key(6),
                          device_env=False, task_batch=True,
                          grouped_roll_factory=factory)
        assert len(out["tasks_rewards"]) == self.N_TASKS
        assert len(out["tasks_success_rate"]) == self.N_TASKS
        assert np.isfinite(out["mean_reward"])

    def test_cl_rl_exp_task_batched(self, tmp_path):
        """Batched CL matrix: same artifacts/shape as the sequential host
        path, adapt-progress recorded per task per step."""
        import json, os
        from exploring_meta_tpu.analysis.cl import run_cl_rl_exp
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        policy, params = self._policies()
        env = HostVecEnv(lambda: FakeHostEnv(), self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=2,
                          adapt_batch_size=self.EPISODES,
                          max_path_length=self.HORIZON)

        def factory(n):
            big = HostVecEnv(lambda: FakeHostEnv(), n * self.EPISODES)
            return make_grouped_host_rollout(big, policy, self.HORIZON, n,
                                             self.EPISODES)

        roll = make_host_rollout(env, policy, self.HORIZON)
        rew_m, cl_rew, cl_suc = run_cl_rl_exp(
            str(tmp_path), policy, params, env, roll, cfg,
            jax.random.key(8), n_tasks=self.N_TASKS, algo="trpo",
            grouped_roll_factory=factory)
        assert rew_m.shape == (self.N_TASKS, self.N_TASKS)
        assert np.all(np.isfinite(rew_m))
        assert np.isfinite(cl_rew["av_acc"]) and np.isfinite(cl_suc["av_acc"])
        prog = json.load(open(os.path.join(str(tmp_path), "cl_exp",
                                           "adapt_progress.json")))
        assert set(prog["reward"]) == {f"task_{i+1}"
                                       for i in range(self.N_TASKS)}
        assert set(prog["reward"]["task_1"]) == {"step_0", "step_1"}

    def test_cl_rl_exp_host_array_tasks_sequential(self, tmp_path):
        """Regression: host envs with ndarray tasks (AntDirection shape)
        must take the eager path — host-ness comes from the env, not the
        task container type."""
        from exploring_meta_tpu.analysis.cl import run_cl_rl_exp
        policy, params = self._policies()
        env = HostVecEnv(lambda: FakeHostEnv(), self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1,
                          adapt_batch_size=self.EPISODES,
                          max_path_length=self.HORIZON)
        roll = make_host_rollout(env, policy, self.HORIZON)
        rew_m, _, _ = run_cl_rl_exp(str(tmp_path), policy, params, env,
                                    roll, cfg, jax.random.key(9),
                                    n_tasks=2, algo="trpo")
        assert rew_m.shape == (2, 2)
        assert np.all(np.isfinite(rew_m))

    def test_rep_rl_exp_task_batched(self, tmp_path):
        """Batched RC experiment: same artifact layout as the sequential
        path, per-(task,step) probes task-major."""
        import json, os
        from exploring_meta_tpu.analysis.rc import run_rep_rl_exp
        from exploring_meta_tpu.envs.host import make_grouped_host_rollout
        policy, params = self._policies()
        env = HostVecEnv(lambda: FakeHostEnv(), self.EPISODES)
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=2,
                          adapt_batch_size=self.EPISODES,
                          max_path_length=self.HORIZON)

        def factory(n):
            big = HostVecEnv(lambda: FakeHostEnv(), n * self.EPISODES)
            return make_grouped_host_rollout(big, policy, self.HORIZON, n,
                                             self.EPISODES)

        roll = make_host_rollout(env, policy, self.HORIZON)
        res = run_rep_rl_exp(str(tmp_path), policy, params, env, roll, cfg,
                             jax.random.key(11),
                             rep_params={"n_tasks": self.N_TASKS,
                                         "layers": [1, 2]},
                             algo="trpo", grouped_roll_factory=factory)
        # one across-layers CCA per task per layer
        assert len(res["cca"]["1"]) == self.N_TASKS
        assert len(res["cca"]["2"]) == self.N_TASKS
        # (task-major) per-step probes: n_tasks * adapt_steps entries
        assert len(res["across_steps"]["init_mean"]) == self.N_TASKS * 2
        extra = json.load(open(os.path.join(str(tmp_path), "rep_exp",
                                            "rep_extra.json")))
        assert len(extra["performance"]) == self.N_TASKS
        assert all(np.isfinite(v) for v in res["cca"]["1"])
