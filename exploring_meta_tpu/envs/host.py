"""Host-side physics environments behind the device rollout contract.

MuJoCo physics cannot run on TPU, so these envs follow the SURVEY.md §7.7
split: the policy lives on device; a host worker steps the C physics and
the finished batch is shipped to the device as one fixed-shape
:class:`~exploring_meta_tpu.rl.rollout.Trajectory` — one host->device
transfer per rollout instead of the reference's per-step subprocess IPC
(``utils/env_maker.py:18-21,42-45``).

``HostVecEnv`` replaces l2l's ``AsyncVectorEnv`` + cherry ``Runner``. The
per-step policy evaluation runs on device through a jitted action fn with
host-side observation batching (E envs stepped lockstep).

Envs provided:
- ``AntDirectionEnv``  — gymnasium MuJoCo Ant with direction-reward tasks
  (l2l's ``AntDirection-v1``: reward = velocity along a task direction
  + survival - control/contact costs).
- Meta-World ML1/ML10/ML45 via :mod:`exploring_meta_tpu.envs.metaworld_adapter`
  (gated on the ``metaworld`` package).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from exploring_meta_tpu.rl.rollout import Trajectory

# Where the per-step policy forward runs during host-env collection.
# "device" = the default jax device (the TPU chip): one host->device->host
# round-trip per env step. "cpu" = the in-process CPU backend: the policy
# params are committed to the CPU device once per rollout, so every
# per-step action evaluation is local — zero tunnel/PCIe crossings until
# the finished Trajectory ships to the TPU in one transfer. Collection is
# forward-only (replays are re-derived on device for gradients, reference
# core_functions/rl.py:346-405), so nothing about training needs the
# per-step forward to run on the accelerator.
_POLICY_DEVICE_MODE = "device"


def set_host_policy_device(mode: str) -> None:
    """Set the default placement for host-rollout policy evaluation
    (``"device"`` or ``"cpu"``); trainers wire ``--host_policy`` here."""
    global _POLICY_DEVICE_MODE
    if mode not in ("device", "cpu"):
        raise ValueError(f"host policy device must be 'device' or 'cpu', "
                         f"got {mode!r}")
    _POLICY_DEVICE_MODE = mode


def _place_policy(mode, tree):
    """Commit ``tree`` (params + key) to the collection device for
    ``mode`` (``None`` -> the module default set by
    :func:`set_host_policy_device`)."""
    mode = mode or _POLICY_DEVICE_MODE
    if mode not in ("device", "cpu"):  # typos must not silently fall
        raise ValueError(f"host policy device must be 'device' or 'cpu', "
                         f"got {mode!r}")  # back to the device path
    if mode == "cpu":
        return jax.device_put(tree, jax.devices("cpu")[0])
    return tree


class AntDirectionEnv:
    """AntDirection-v1 semantics on gymnasium's MuJoCo Ant.

    A task is a 2D unit direction; forward reward is the velocity
    component along it (reference env: l2l.gym AntDirectionEnv, requested
    at ``utils/env_maker.py:7``).
    """

    def __init__(self, seed: int = 42):
        import gymnasium as gym
        self._gym = gym
        self._env = gym.make("Ant-v5",
                             exclude_current_positions_from_observation=True)
        self._seed = seed
        self._task = np.array([1.0, 0.0])
        self.obs_size = int(np.prod(self._env.observation_space.shape))
        self.action_size = int(np.prod(self._env.action_space.shape))
        self._act_low = self._env.action_space.low
        self._act_high = self._env.action_space.high
        self._rng = np.random.default_rng(seed)
        # Seed gym's np_random NOW (reference make_env seeds at build,
        # env_maker.py:16): otherwise reset(seed=None) draws from OS
        # entropy and runs are irreproducible.
        self._env.reset(seed=seed)

    # MetaEnv task API (l2l parity: sample_tasks / set_task)
    def sample_tasks(self, key, n: int) -> np.ndarray:
        del key  # host RNG; device keys are for device envs
        theta = self._rng.uniform(0, 2 * np.pi, size=n)
        return np.stack([np.cos(theta), np.sin(theta)], axis=1)

    def set_task(self, task) -> None:
        self._task = np.asarray(task)

    def reset(self, seed: int | None = None):
        obs, _ = self._env.reset(seed=seed)
        return obs

    def step(self, action):
        # ActionSpaceScaler parity (reference env_maker.py:15,39): the raw
        # Gaussian sample is stored for log-probs, but the physics sees an
        # action clamped to the space bounds — otherwise MuJoCo diverges.
        action = np.clip(np.asarray(action), self._act_low, self._act_high)
        obs, _, terminated, truncated, info = self._env.step(action)
        # Direction-projected forward reward replaces the default x-velocity
        # reward; control/contact costs and survival bonus are kept.
        vel = np.array([info.get("x_velocity", 0.0),
                        info.get("y_velocity", 0.0)])
        fwd = float(vel @ self._task)
        ctrl_cost = float(info.get("reward_ctrl", 0.0))   # negative
        contact_cost = float(info.get("reward_contact", 0.0))  # negative
        survive = float(info.get("reward_survive", 0.0))
        reward = fwd + ctrl_cost + contact_cost + survive
        done = bool(terminated)
        success = 0.0
        return obs, reward, done, truncated, success


class HostVecEnv:
    """Step E host envs in lockstep and emit a device Trajectory.

    The AsyncVectorEnv replacement. Batched stepping goes through the C++
    thread-pool service (native/vecenv.cpp ``vecenv_create_python``) when
    available — one ctypes crossing per step for the whole batch, env
    physics overlapping across pool threads (MuJoCo releases the GIL in
    ``mj_step``) — with a sequential pure-Python fallback.

    ``backend``: "auto" (native when buildable, else Python), "native"
    (required), or "python" (forced sequential loop).
    """

    def __init__(self, env_factory: Callable[[], object], n_envs: int,
                 backend: str = "auto", n_threads: int | None = None):
        self.envs = [env_factory() for _ in range(n_envs)]
        self.n_envs = n_envs
        e = self.envs[0]
        self.obs_size = e.obs_size
        self.action_size = e.action_size
        self._pool = None
        if backend not in ("auto", "native", "python"):
            # typos must not silently fall back (same rule as _place_policy)
            raise ValueError(f"unknown backend {backend!r}; "
                             "one of 'auto' | 'native' | 'python'")
        # The pool only pays off when worker threads can overlap physics
        # (MuJoCo releases the GIL). With ONE effective worker it still
        # pays the per-env callback crossing plus the enqueue/handoff —
        # measured 0.7-0.8x of the plain sequential loop on a 1-core box
        # (BASELINE.md r5s8) — so "auto" takes the sequential path there;
        # backend="native" still forces the pool (the bench A/B row).
        # "Effective" clamps the REQUESTED count to the core count: on a
        # 1-core host, --workers 4 threads still run one at a time.
        _threads = min(n_threads if n_threads is not None else n_envs,
                       os.cpu_count() or 1)
        if backend == "auto" and _threads <= 1:
            pass
        elif backend in ("auto", "native"):
            try:
                from exploring_meta_tpu.native.binding import PythonEnvPool
                self._pool = PythonEnvPool(self.envs, n_threads=n_threads)
            except Exception as exc:
                if backend == "native":
                    raise
                import sys
                print(f"native env pool unavailable ({exc}); "
                      "falling back to sequential stepping",
                      file=sys.stderr)
        self.backend = "native" if self._pool is not None else "python"

    def sample_tasks(self, key, n: int):
        return self.envs[0].sample_tasks(key, n)

    def set_task(self, task) -> None:
        for e in self.envs:
            e.set_task(task)

    def set_tasks(self, tasks, group_size: int) -> None:
        """Assign task ``i`` to env slots ``[i*group_size, (i+1)*group_size)``
        — the slot layout of task-batched collection
        (:func:`make_grouped_host_rollout`)."""
        if len(tasks) * group_size != self.n_envs:
            raise ValueError(f"{len(tasks)} tasks x group {group_size} != "
                             f"{self.n_envs} env slots")
        for i, e in enumerate(self.envs):
            e.set_task(tasks[i // group_size])

    def collect(self, action_fn: Callable, key, horizon: int,
                seed: int | None = None) -> Trajectory:
        """Roll all E envs for ``horizon`` steps.

        ``action_fn(key, obs_batch [E, obs]) -> actions [E, act]`` — a
        jitted function closed over the policy params; obs are handed to
        it as numpy, so jit commits them to whatever device the params
        are committed to (TPU by default; the local CPU backend under
        ``set_host_policy_device("cpu")``), batched over E.
        """
        E, T = self.n_envs, horizon
        if self._pool is not None:
            obs = self._pool.reset(seed=seed)  # pool offsets seed per slot
        else:
            obs = np.stack([
                e.reset(seed=None if seed is None else seed + i)
                for i, e in enumerate(self.envs)])
        states = np.zeros((T, E, self.obs_size), np.float32)
        next_states = np.zeros_like(states)
        actions = np.zeros((T, E, self.action_size), np.float32)
        rewards = np.zeros((T, E), np.float32)
        dones = np.zeros((T, E), np.float32)
        successes = np.zeros((T, E), np.float32)
        valids = np.zeros((T, E), np.float32)
        timesteps = np.zeros((T, E), np.int32)

        alive = np.ones(E, bool)
        t_in_ep = np.zeros(E, np.int32)
        keys = jax.random.split(key, T)
        for t in range(T):
            acts = np.asarray(action_fn(keys[t], obs))
            states[t] = obs
            actions[t] = acts
            timesteps[t] = t_in_ep
            valids[t] = alive.astype(np.float32)
            if self._pool is not None:
                # One native call fans the whole batch across pool threads.
                # Finished envs get stepped too (results discarded below) —
                # physics is per-env independent, so recorded trajectories
                # are identical to the sequential path.
                o2b, rb, db, sb = self._pool.step(acts)
                step_results = [(o2b[i], rb[i], db[i] > 0.5, False, sb[i])
                                for i in range(E)]
            else:
                step_results = [env.step(acts[i]) if alive[i] else None
                                for i, env in enumerate(self.envs)]
            for i in range(E):
                if not alive[i]:
                    next_states[t, i] = obs[i]
                    dones[t, i] = 1.0
                    continue
                o2, r, done, truncated, suc = step_results[i]
                next_states[t, i] = o2
                rewards[t, i] = r
                successes[t, i] = suc
                dones[t, i] = 1.0 if (done or t == T - 1) else 0.0
                if done:
                    alive[i] = False
                else:
                    obs[i] = o2
                    t_in_ep[i] += 1

        return Trajectory(
            state=jnp.asarray(states), action=jnp.asarray(actions),
            reward=jnp.asarray(rewards), done=jnp.asarray(dones),
            next_state=jnp.asarray(next_states),
            success=jnp.asarray(successes), valid=jnp.asarray(valids),
            timestep=jnp.asarray(timesteps))


def make_grouped_host_rollout(vec_env: HostVecEnv, policy, horizon: int,
                              n_tasks: int, episodes: int,
                              policy_device: str | None = None):
    """Task-batched host rollout: ALL tasks' episodes step in lockstep
    through one vec env of ``n_tasks * episodes`` slots, so each policy
    round-trip (host -> device -> host) serves the whole meta-batch —
    ``n_tasks``x fewer device crossings than per-task collection, and the
    full slot batch fans across the native thread pool at once.

    This is the TPU-native answer to the reference's per-task sequential
    ``Runner`` loop over an ``AsyncVectorEnv`` (rl/maml_trpo.py:102-122 +
    core_functions/runner.py:105,127): instead of parallelizing only
    within a task's episodes, the host batch spans the task axis too.

    Returns ``roll(params_stack, tasks, key) -> Trajectory`` with leading
    ``[n_tasks, T, episodes, ...]`` axes; ``params_stack`` has a leading
    ``[n_tasks]`` axis (per-task adapted policies — broadcast the shared
    init for the first support rollout). ``policy_device``: see
    :func:`make_host_rollout`.
    """
    if vec_env.n_envs != n_tasks * episodes:
        raise ValueError(f"vec env has {vec_env.n_envs} slots, need "
                         f"{n_tasks} tasks x {episodes} episodes")

    @jax.jit
    def action_fn(params_stack, key, obs_flat):
        obs = obs_flat.reshape(n_tasks, episodes, obs_flat.shape[-1])
        keys = jax.random.split(key, n_tasks)
        acts = jax.vmap(policy.sample)(params_stack, keys, obs)
        return acts.reshape(n_tasks * episodes, acts.shape[-1])

    def roll(params_stack, tasks, key):
        if not isinstance(tasks, (list, tuple)):
            tasks = list(np.asarray(tasks))
        vec_env.set_tasks(tasks, episodes)
        params_stack, key = _place_policy(policy_device, (params_stack, key))
        traj = vec_env.collect(
            lambda k, o: action_fn(params_stack, k, o), key, horizon)

        def regroup(x):  # [T, n_tasks*episodes, ...] -> [n_tasks, T, episodes, ...]
            x = x.reshape((x.shape[0], n_tasks, episodes) + x.shape[2:])
            return jnp.moveaxis(x, 1, 0)

        return jax.tree_util.tree_map(regroup, traj)

    return roll


def make_grouped_roll_factory(env_name: str, policy, cfg, seed: int,
                              test: bool = True):
    """-> ``factory(n_tasks) -> grouped rollout`` for task-batched
    evaluation/analysis on a named host env (the single construction
    point shared by ``rl.meta_test`` and ``analysis.eval_rl``).

    Memoized per ``n_tasks``: eval + CL + RC sections reuse one big vec
    env instead of instantiating ``n * episodes`` physics envs each.
    ``cfg`` is an ``rl.RLConfig`` (episodes = ``adapt_batch_size``,
    horizon = ``max_path_length``).
    """
    cache: dict = {}

    def factory(n: int):
        if n not in cache:
            from exploring_meta_tpu.envs.factory import make_env
            big, _ = make_env(env_name, workers=n * cfg.adapt_batch_size,
                              seed=seed, test=test,
                              max_path_length=cfg.max_path_length)
            cache[n] = make_grouped_host_rollout(big, policy,
                                                 cfg.max_path_length, n,
                                                 cfg.adapt_batch_size)
        return cache[n]

    return factory


def make_host_rollout(vec_env: HostVecEnv, policy, horizon: int,
                      policy_device: str | None = None):
    """Rollout closure with the device-env signature:
    ``(params, task, key) -> Trajectory``. The action fn is jitted once;
    params are closed over per call.

    ``policy_device`` (``None`` -> module default): ``"cpu"`` commits the
    params + rollout key to the in-process CPU backend once per rollout,
    making every per-step policy forward local instead of a
    host->TPU->host round-trip — the win when device dispatch latency
    (e.g. a tunneled/remote chip) dominates tiny per-step matmuls.
    """

    @jax.jit
    def action_fn(params, key, obs):
        return policy.sample(params, key, obs)

    def roll(params, task, key):
        # Meta-World-style tasks are dicts — pass through untouched; array
        # tasks (goal vectors) are coerced off-device.
        vec_env.set_task(task if isinstance(task, dict) else np.asarray(task))
        params, key = _place_policy(policy_device, (params, key))
        return vec_env.collect(
            lambda k, o: action_fn(params, k, o), key, horizon)

    return roll
