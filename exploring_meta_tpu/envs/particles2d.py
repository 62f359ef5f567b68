"""Particles2D: goal-conditioned 2D point navigation, fully on device.

TPU-native rebuild of l2l.gym's ``Particles2D-v1`` (the env the reference
requests through ``utils/env_maker.py:7,11-21``): a point mass starts at
the origin, actions are clipped displacement steps, reward is the negative
Euclidean distance to a task-specific goal, and the episode terminates
when BOTH coordinates are within 0.01 of the goal (l2l's per-coordinate
box test ``abs(x) < 0.01 and abs(y) < 0.01`` — NOT a Euclidean disk). A
task is the goal position, sampled uniformly from [-0.5, 0.5]^2
(``sample_tasks``/``set_task`` parity with l2l's MetaEnv API).

Because the dynamics are pure math, whole batched rollouts run inside one
``lax.scan`` program on TPU — replacing the reference's per-step Python ->
pipe -> subprocess round-trip (``core_functions/runner.py:105,127``).
This env doubles as the deterministic RL test fixture (SURVEY.md §4c).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EnvState(NamedTuple):
    pos: jnp.ndarray      # [2]
    t: jnp.ndarray        # scalar int32 step counter
    done: jnp.ndarray     # scalar bool — episode already terminated


class Particles2D(NamedTuple):
    """Static env spec. Methods are pure functions over EnvState."""
    max_action: float = 0.1
    goal_threshold: float = 0.01
    obs_size: int = 2
    action_size: int = 2

    def sample_tasks(self, key, n: int) -> jnp.ndarray:
        """-> [n, 2] goals ~ U[-0.5, 0.5]^2."""
        return jax.random.uniform(key, (n, 2), minval=-0.5, maxval=0.5)

    def reset(self, key, task: jnp.ndarray) -> tuple[EnvState, jnp.ndarray]:
        del key  # deterministic start at the origin
        state = EnvState(pos=jnp.zeros(2), t=jnp.zeros((), jnp.int32),
                         done=jnp.zeros((), bool))
        return state, state.pos

    def step(self, state: EnvState, action: jnp.ndarray, task: jnp.ndarray):
        """-> (next_state, obs, reward, done, success). Frozen after done
        (post-termination steps are masked out by the rollout layer)."""
        action = jnp.clip(action, -self.max_action, self.max_action)
        new_pos = jnp.where(state.done, state.pos, state.pos + action)
        diff = new_pos - task
        reward = -jnp.linalg.norm(diff)
        # l2l Particles2DEnv terminates on the per-coordinate box, not the
        # Euclidean disk: done = abs(dx) < thr and abs(dy) < thr.
        done_now = jnp.all(jnp.abs(diff) < self.goal_threshold)
        next_state = EnvState(pos=new_pos, t=state.t + 1,
                              done=state.done | done_now)
        success = done_now.astype(jnp.float32)
        return next_state, new_pos, reward, next_state.done, success
