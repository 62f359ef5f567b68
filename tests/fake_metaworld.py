"""Hermetic fake of the `metaworld` package for adapter conformance tests.

Exposes exactly the attribute surface
``exploring_meta_tpu/envs/metaworld_adapter.py`` consumes from the real
package (and that the reference wrapper consumed,
``/root/reference/utils/metaworld_wrapper.py:6-53``):

- ``ML1(task_name, seed=...)``, ``ML10(seed=...)``, ``ML45(seed=...)``
- benchmark ``.train_classes`` / ``.test_classes`` — ordered dicts of
  env-name -> env class
- ``.train_tasks`` / ``.test_tasks`` — lists of task objects with an
  ``.env_name`` attribute (goal data opaque to the adapter)
- env instances with gym-style ``observation_space`` / ``action_space``,
  ``set_task(task)``, ``reset(seed=) -> (obs, info)`` and
  ``step(a) -> (obs, reward, terminated, truncated, info)`` where ``info``
  carries a ``success`` flag among other keys (the adapter must strip
  everything but success).

Inject with ``sys.modules["metaworld"] = tests.fake_metaworld`` (the
``fake_metaworld`` fixture in conftest does this) — the adapter imports
metaworld lazily, so injection before construction is sufficient.

Dynamics: 9-dim point state (reference ML10 state_size 9,
eval_rl.py:118), 4-dim actions (action_size 4), reward = -|pos - goal|,
success when within 0.05 of the goal. Never terminates on its own, so
horizon-done forcing is observable.
"""

from __future__ import annotations

import numpy as np

# Train/test class names in the reference's ML10 table order
# (/root/reference/core_functions/rl.py:22-41) so that positional task ids
# 0..9 / 0..4 line up with ML10_TRAIN_TASK_NAMES / ML10_EVAL_TASK_NAMES.
ML10_TRAIN_NAMES = [
    "reach", "push", "pick-place", "door-open", "drawer-close",
    "button-press", "peg-insert-side", "window-open", "sweep", "basketball",
]
ML10_TEST_NAMES = [
    "drawer-open", "door-close", "shelf-place", "sweep-into", "lever-pull",
]

OBS_DIM = 9
ACT_DIM = 4
TASKS_PER_CLASS = 50


class _Box:
    def __init__(self, shape):
        self.shape = shape
        # real metaworld/gym Box surface: the adapter clamps to these
        self.low = -np.ones(shape)
        self.high = np.ones(shape)


class Task:
    """Goal-parameterized task pin (real metaworld's Task is a pickled
    namedtuple; the adapter only reads .env_name and passes the object
    through to set_task)."""

    def __init__(self, env_name: str, goal: np.ndarray):
        self.env_name = env_name
        self.data = np.asarray(goal, np.float64)


class FakeSawyerEnv:
    """Deterministic point-mass stand-in for one manipulation env."""

    def __init__(self):
        self.observation_space = _Box((OBS_DIM,))
        self.action_space = _Box((ACT_DIM,))
        self._goal = np.zeros(OBS_DIM)
        self._pos = np.zeros(OBS_DIM)

    def set_task(self, task: Task) -> None:
        if task.env_name != type(self).__name__:
            raise ValueError(
                f"task for {task.env_name!r} set on {type(self).__name__!r}")
        self._goal = task.data.copy()

    def reset(self, seed: int | None = None):
        rng = np.random.default_rng(0 if seed is None else seed)
        self._pos = 0.01 * rng.standard_normal(OBS_DIM)
        return self._pos.copy(), {"initial": True}

    def step(self, action):
        self.last_action = np.asarray(action, np.float64).copy()
        a = np.clip(self.last_action, -1.0, 1.0)
        delta = np.zeros(OBS_DIM)
        delta[:ACT_DIM] = a
        self._pos = self._pos + 0.05 * delta
        dist = float(np.linalg.norm(self._pos - self._goal))
        info = {"success": float(dist < 0.05),
                "goal_dist": dist,          # junk the adapter must drop
                "unpickleable": object()}   # likewise
        return self._pos.copy(), -dist, False, False, info


def _make_classes(names):
    # Distinct class per env name: set_task validates routing by class name.
    return {name: type(name, (FakeSawyerEnv,), {}) for name in names}


class _Benchmark:
    def __init__(self, train_names, test_names, seed=0):
        rng = np.random.default_rng(seed)
        self.train_classes = _make_classes(train_names)
        self.test_classes = _make_classes(test_names)
        self.train_tasks = [
            Task(n, 0.1 * rng.standard_normal(OBS_DIM))
            for n in train_names for _ in range(TASKS_PER_CLASS)]
        self.test_tasks = [
            Task(n, 0.1 * rng.standard_normal(OBS_DIM))
            for n in test_names for _ in range(TASKS_PER_CLASS)]


class ML1(_Benchmark):
    ENV_NAMES = ML10_TRAIN_NAMES + ML10_TEST_NAMES

    def __init__(self, task_name: str, seed: int | None = None):
        if task_name not in self.ENV_NAMES:
            raise ValueError(f"unknown ML1 task {task_name!r}")
        super().__init__([task_name], [task_name], seed=seed or 0)


class ML10(_Benchmark):
    def __init__(self, seed: int | None = None):
        super().__init__(ML10_TRAIN_NAMES, ML10_TEST_NAMES, seed=seed or 0)


class ML45(_Benchmark):
    def __init__(self, seed: int | None = None):
        train = [f"task-{i}" for i in range(45)]
        super().__init__(train, ML10_TEST_NAMES, seed=seed or 0)
