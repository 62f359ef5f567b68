"""Trajectory container + on-device rollout engine.

Replaces ``cherry.ExperienceReplay`` + the reference ``Runner``
(``core_functions/runner.py``): instead of an append-only host store fed
by per-step subprocess IPC, a rollout is a fixed-shape time-major pytree
``Trajectory [T, E, ...]`` produced by ``lax.scan`` over the horizon with
``vmap`` over E parallel episodes — the whole data-collection loop is one
XLA program.

Episode semantics: every episode slot runs exactly ``horizon`` scan steps.
``done`` marks the terminal transition; ``valid`` masks out steps after
termination (the reference's replays simply contain no such steps — all
loss reductions here are ``valid``-weighted means, which is equivalent).
The final step of every slot is forced done, mirroring the reference's
horizon-done wrapper (``utils/metaworld_wrapper.py:30-40``).

``timestep`` is the within-episode step index used by the linear value
baseline features (see ops/value.py for the reference quirk discussion).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    state: jnp.ndarray       # [T, E, obs]
    action: jnp.ndarray      # [T, E, act]
    reward: jnp.ndarray      # [T, E]
    done: jnp.ndarray        # [T, E] float (terminal transition flag)
    next_state: jnp.ndarray  # [T, E, obs]
    success: jnp.ndarray     # [T, E] float
    valid: jnp.ndarray       # [T, E] float (1 = real step)
    timestep: jnp.ndarray    # [T, E] int32 within-episode index

    @property
    def horizon(self) -> int:
        return self.state.shape[0]

    @property
    def n_episodes(self) -> int:
        return self.state.shape[1]

    def flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """[T, E, ...] -> [T*E, ...] (episode-major like the reference's
        flattened replays when E=1; ordering is irrelevant to the masked
        losses)."""
        return x.reshape((-1,) + x.shape[2:])

    def episode_rewards(self) -> jnp.ndarray:
        """[E] sum of valid rewards per episode."""
        return jnp.sum(self.reward * self.valid, axis=0)

    def episode_successes(self) -> jnp.ndarray:
        """[E] 1 if any valid step flagged success
        (reference ``get_ep_successes``, rl.py:59-72)."""
        return (jnp.sum(self.success * self.valid, axis=0) > 0).astype(jnp.float32)

    def episode_success_steps(self) -> jnp.ndarray:
        """[E] int32 index of the first successful valid step, -1 if the
        episode never succeeds (reference ``get_success_per_ep``,
        rl.py:75-92 — whose ``success_step`` its CL driver computes and
        then discards, ``misc_scripts/cl_rl.py:109``; exposed here so CL
        adapt-progress artifacts can report it)."""
        hit = (self.success * self.valid) > 0.1          # [T, E]
        first = jnp.argmax(hit, axis=0).astype(jnp.int32)
        return jnp.where(jnp.any(hit, axis=0), first, -1)


def rollout(env, policy_sample: Callable, params, task, key,
            episodes: int, horizon: int) -> Trajectory:
    """Collect ``episodes`` fixed-horizon episodes under the current policy.

    ``policy_sample(params, key, obs_batch) -> action_batch`` (stochastic);
    ``env`` follows the Particles2D pure-env protocol (reset/step over a
    single episode state; vmapped here over E).
    """
    reset_keys = jax.random.split(key, episodes + 1)
    key = reset_keys[0]
    init_state, init_obs = jax.vmap(lambda k: env.reset(k, task))(reset_keys[1:])

    def scan_step(carry, step_key):
        env_state, obs = carry
        # stop_gradient: sampled actions are data (torch `.sample()`
        # semantics) — no reparameterization path may leak into the
        # meta-gradient through the env dynamics.
        actions = jax.lax.stop_gradient(policy_sample(params, step_key, obs))
        next_env_state, next_obs, reward, done, success = jax.vmap(
            lambda s, a: env.step(s, a, task))(env_state, actions)
        was_done = env_state.done  # already terminated before this step
        valid = 1.0 - was_done.astype(jnp.float32)
        # Post-termination filler steps carry zero reward/success so the
        # advantage pipeline sees exactly the reference's replay contents.
        record = (obs, actions, reward * valid,
                  done.astype(jnp.float32), next_obs,
                  success * valid, valid, env_state.t)
        return (next_env_state, next_obs), record

    step_keys = jax.random.split(key, horizon)
    _, (states, actions, rewards, dones, next_states, successes, valids,
        timesteps) = jax.lax.scan(scan_step, (init_state, init_obs), step_keys)

    # Horizon-done: the last valid step of each episode is terminal.
    dones = dones.at[-1].set(jnp.maximum(dones[-1], valids[-1]))
    return Trajectory(state=states, action=actions, reward=rewards,
                      done=dones, next_state=next_states, success=successes,
                      valid=valids, timestep=timesteps)


def make_rollout(env, policy_sample: Callable, episodes: int, horizon: int):
    """Jit-friendly closure: ``(params, task, key) -> Trajectory``."""
    return partial(rollout, env, policy_sample,
                   episodes=episodes, horizon=horizon)
