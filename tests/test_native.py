"""Native vecenv service tests: build, protocol, and parity with the
pure-JAX device env."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu.envs import Particles2D

native = pytest.importorskip("exploring_meta_tpu.native")
if not native.native_available():  # no g++ in env
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_build_and_sizes():
    env = native.NativeVecEnv(n_envs=4)
    assert env.obs_size == 2 and env.action_size == 2


def test_reset_and_step_shapes():
    env = native.NativeVecEnv(n_envs=3)
    obs = env.reset(np.array([0.3, -0.2]))
    assert obs.shape == (3, 2)
    np.testing.assert_allclose(obs, 0.0)
    obs, rew, done, suc = env.step(np.full((3, 2), 0.05))
    assert obs.shape == (3, 2) and rew.shape == (3,)


def test_parity_with_jax_device_env():
    """The C++ physics must match the pure-JAX Particles2D exactly."""
    jenv = Particles2D()
    task = jnp.array([0.31, -0.17])
    state, obs_j = jenv.reset(jax.random.key(0), task)

    nenv = native.NativeVecEnv(n_envs=1)
    obs_n = nenv.reset(np.asarray(task))

    rng = np.random.default_rng(0)
    for t in range(30):
        action = rng.uniform(-0.2, 0.2, size=2)  # exercises the clip too
        state, obs_j, rew_j, done_j, suc_j = jenv.step(
            state, jnp.asarray(action), task)
        obs_n, rew_n, done_n, suc_n = nenv.step(action[None])
        np.testing.assert_allclose(np.asarray(obs_j), obs_n[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(rew_j), rew_n[0], rtol=1e-5, atol=1e-6)
        assert float(done_j) == done_n[0]


def test_box_termination_corner_parity():
    """Box-vs-disk divergence point (deviations registry D5): at
    diff = (0.008, 0.008) the l2l box test terminates (both coords
    < 0.01) while the old Euclidean-disk rule would not (dist ~0.0113).
    Native and device envs must agree on the box semantics."""
    task = jnp.array([0.008, 0.008])
    jenv = Particles2D()
    state, _ = jenv.reset(jax.random.key(0), task)
    zero = jnp.zeros(2)
    state, _, _, done_j, suc_j = jenv.step(state, zero, task)

    nenv = native.NativeVecEnv(n_envs=1)
    nenv.reset(np.asarray(task))
    _, _, done_n, suc_n = nenv.step(np.zeros((1, 2)))
    assert float(done_j) == done_n[0] == 1.0
    assert float(suc_j) == suc_n[0] == 1.0


def test_per_env_tasks():
    env = native.NativeVecEnv(n_envs=2)
    tasks = np.array([[0.5, 0.0], [0.0, 0.5]])
    env.reset(tasks)
    # moving +x should approach goal 0 but not goal 1
    obs, rew, done, suc = env.step(np.array([[0.1, 0.0], [0.1, 0.0]]))
    assert rew[0] > rew[1]


def test_done_freezes_env():
    env = native.NativeVecEnv(n_envs=1)
    env.reset(np.array([0.05, 0.0]))
    obs, rew, done, suc = env.step(np.array([[0.05, 0.0]]))
    assert done[0] == 1.0 and suc[0] == 1.0
    obs2, rew2, done2, suc2 = env.step(np.array([[0.1, 0.1]]))
    np.testing.assert_allclose(obs2, obs)  # frozen after done


# ---------------------------------------------------------------------------
# Python-env-backed pool (the REAL host rollout path: MuJoCo / Meta-World
# stepping dispatched through the C++ thread pool via indexed callbacks)
# ---------------------------------------------------------------------------

class _CountingEnv:
    """Deterministic host-protocol env for pool-contract tests."""

    obs_size = 3
    action_size = 2

    def __init__(self, idx):
        self.idx = idx
        self.resets = 0
        self.t = 0

    def reset(self, seed=None):
        self.resets += 1
        self.t = 0
        return np.full(3, float(self.idx), np.float64)

    def step(self, action):
        self.t += 1
        obs = np.array([self.idx, self.t, float(action[0])])
        reward = float(self.idx * 100 + self.t)
        done = self.t >= 2
        return obs, reward, done, False, float(self.idx == 1)


def test_python_env_pool_contract():
    from exploring_meta_tpu.native.binding import PythonEnvPool

    envs = [_CountingEnv(i) for i in range(4)]
    pool = PythonEnvPool(envs, n_threads=2)
    obs = pool.reset(seed=None)
    assert obs.shape == (4, 3)
    np.testing.assert_allclose(obs[:, 0], np.arange(4))

    acts = np.tile(np.array([[0.5, -0.5]]), (4, 1))
    obs, rew, done, suc = pool.step(acts)
    np.testing.assert_allclose(obs[:, 1], 1.0)       # each env stepped once
    np.testing.assert_allclose(obs[:, 2], 0.5)       # action routed per env
    np.testing.assert_allclose(rew, np.arange(4) * 100 + 1)
    np.testing.assert_allclose(suc, [0, 1, 0, 0])
    np.testing.assert_allclose(done, 0.0)
    _, _, done, _ = pool.step(acts)
    np.testing.assert_allclose(done, 1.0)            # per-env done at t=2


def test_python_env_pool_propagates_exceptions():
    from exploring_meta_tpu.native.binding import PythonEnvPool

    class Boom(_CountingEnv):
        def step(self, action):
            raise RuntimeError("physics exploded")

    pool = PythonEnvPool([Boom(0)], n_threads=1)
    pool.reset()
    with pytest.raises(RuntimeError, match="physics exploded"):
        pool.step(np.zeros((1, 2)))


def test_hostvecenv_native_matches_python_on_mujoco():
    """HostVecEnv(backend='native') must record bit-equal trajectories to
    the sequential Python loop on real MuJoCo Ant."""
    from exploring_meta_tpu.envs.host import (
        AntDirectionEnv, HostVecEnv, make_host_rollout,
    )
    from exploring_meta_tpu.models import DiagNormalPolicy

    trajs = {}
    for backend in ("python", "native"):
        env = HostVecEnv(lambda: AntDirectionEnv(seed=0), 3, backend=backend)
        assert env.backend == backend
        policy = DiagNormalPolicy(input_size=env.obs_size,
                                  output_size=env.action_size)
        params = policy.init(jax.random.key(0))
        roll = make_host_rollout(env, policy, horizon=8)
        task = env.sample_tasks(None, 1)[0]
        trajs[backend] = roll(params, task, jax.random.key(5))
    for field in trajs["python"]._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(trajs["python"], field)),
            np.asarray(getattr(trajs["native"], field)), atol=1e-6,
            err_msg=field)


def test_hostvecenv_auto_backend_heuristic(fake_metaworld, monkeypatch):
    """auto picks the C++ pool when buildable AND >1 worker thread can
    overlap physics; with one effective worker the pool only adds the
    enqueue/callback handoff (measured 0.7-0.8x of the sequential loop,
    BASELINE.md r5s8), so auto takes the sequential path there."""
    import os as os_mod

    from exploring_meta_tpu.envs.factory import make_env

    monkeypatch.setattr(os_mod, "cpu_count", lambda: 8)
    env, is_device = make_env("ML10", workers=2, seed=0, max_path_length=4)
    assert not is_device
    assert env.backend == "native"

    monkeypatch.setattr(os_mod, "cpu_count", lambda: 1)
    env, _ = make_env("ML10", workers=2, seed=0, max_path_length=4)
    assert env.backend == "python"
