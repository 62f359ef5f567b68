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


def _pallas_ok(use_pallas: bool | None) -> bool:
    """Route to the fused Pallas kernels on TPU by default: XLA lowers
    these reverse scans to a sequential loop that measures ~1000x slower
    than the single-VMEM-pass kernel on this hardware (see
    pallas/gae_pallas.py). ``EMT_GAE_PALLAS=0|1`` overrides for A/B
    measurement (bench.py / chip_queue.sh)."""
    if use_pallas is not None:
        return use_pallas
    import os
    env = os.environ.get("EMT_GAE_PALLAS")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def discount(gamma: float, rewards: jnp.ndarray, dones: jnp.ndarray,
             bootstrap: jnp.ndarray | float = 0.0,
             use_pallas: bool | None = None) -> jnp.ndarray:
    """Discounted returns with reset at episode boundaries.

    ``R_t = r_t + gamma * (1 - done_t) * R_{t+1}``, scanned in reverse.
    Mirrors ``cherry.td.discount`` (used at reference
    ``core_functions/rl.py:96``).
    """
    if (_pallas_ok(use_pallas) and isinstance(bootstrap, (int, float))
            and bootstrap == 0.0):
        from exploring_meta_tpu.pallas.gae_pallas import discount_pallas
        return discount_pallas(float(gamma), rewards, dones)
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
                          next_value: jnp.ndarray | float = 0.0,
                          use_pallas: bool | None = None) -> jnp.ndarray:
    """GAE(gamma, tau) over a done-delimited trajectory.

    Matches ``cherry.pg.generalized_advantage``: ``next_values`` is
    ``values`` shifted one step with ``next_value`` appended, TD errors are
    then discounted by ``gamma * tau`` with reset at dones.
    """
    if (_pallas_ok(use_pallas) and isinstance(next_value, (int, float))
            and next_value == 0.0):
        from exploring_meta_tpu.pallas.gae_pallas import gae_pallas
        return gae_pallas(float(gamma), float(tau), rewards, dones, values)
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
