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
