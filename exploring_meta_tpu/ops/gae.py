"""Temporal-difference returns and Generalized Advantage Estimation.

TPU-native equivalents of the ``cherry.td.discount`` /
``cherry.pg.generalized_advantage`` calls the reference makes in
``core_functions/rl.py:95-110`` — implemented as reverse ``lax.scan`` over
the time axis so the whole advantage pipeline stays inside one XLA program
(the reference runs these as eager torch loops on CPU).

Layout convention: time is axis 0. Arrays may be ``[T]`` or ``[T, ...]``
(e.g. ``[T, E]`` for E parallel envs, or ``[T, 1]`` to mirror the
reference's flat, concatenated-episodes replay). The scan carry is
elementwise over trailing axes, and ``done`` flags reset accumulation at
episode boundaries, so a flat concatenated layout and a time-major
``[T, E]`` layout give identical results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def discount(gamma: float, rewards: jnp.ndarray, dones: jnp.ndarray,
             bootstrap: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Discounted returns with reset at episode boundaries.

    ``R_t = r_t + gamma * (1 - done_t) * R_{t+1}``, scanned in reverse.
    Mirrors ``cherry.td.discount`` (used at reference
    ``core_functions/rl.py:96``).
    """
    rewards = jnp.asarray(rewards)
    dones = jnp.asarray(dones, dtype=rewards.dtype)
    init = jnp.broadcast_to(jnp.asarray(bootstrap, dtype=rewards.dtype),
                            rewards.shape[1:])

    def step(carry, xs):
        r, d = xs
        carry = r + gamma * carry * (1.0 - d)
        return carry, carry

    _, out = lax.scan(step, init, (rewards, dones), reverse=True)
    return out


def temporal_difference(gamma: float, rewards: jnp.ndarray, dones: jnp.ndarray,
                        values: jnp.ndarray, next_values: jnp.ndarray) -> jnp.ndarray:
    """One-step TD errors ``r_t + gamma * (1 - d_t) * V_{t+1} - V_t``."""
    dones = jnp.asarray(dones, dtype=values.dtype)
    return rewards + gamma * (1.0 - dones) * next_values - values


def generalized_advantage(gamma: float, tau: float, rewards: jnp.ndarray,
                          dones: jnp.ndarray, values: jnp.ndarray,
                          next_value: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """GAE(gamma, tau) over a done-delimited trajectory.

    Matches ``cherry.pg.generalized_advantage``: ``next_values`` is
    ``values`` shifted one step with ``next_value`` appended, TD errors are
    then discounted by ``gamma * tau`` with reset at dones.
    """
    values = jnp.asarray(values)
    nv = jnp.broadcast_to(jnp.asarray(next_value, dtype=values.dtype),
                          values.shape[1:])
    next_values = jnp.concatenate([values[1:], nv[None]], axis=0)
    td = temporal_difference(gamma, rewards, dones, values, next_values)
    return discount(gamma * tau, td, dones)


def compute_advantages(tau: float, gamma: float, rewards: jnp.ndarray,
                       dones: jnp.ndarray, values: jnp.ndarray,
                       next_state_values: jnp.ndarray) -> jnp.ndarray:
    """Advantage pipeline with the reference's bootstrap substitution.

    Replicates ``core_functions/rl.py:95-110``: the value fed to GAE at a
    terminal step is ``V(s'_t)`` rather than ``V(s_t)``
    (``bootstraps = values*(1-d) + next_values*d``), and the trailing
    bootstrap value is zero. ``values``/``next_state_values`` come from a
    fitted baseline (see :mod:`exploring_meta_tpu.ops.value`); fitting is
    done by the caller and is not differentiated through, as in the
    reference.
    """
    dones_f = jnp.asarray(dones, dtype=values.dtype)
    bootstraps = values * (1.0 - dones_f) + next_state_values * dones_f
    return generalized_advantage(gamma, tau, rewards, dones, bootstraps, 0.0)
