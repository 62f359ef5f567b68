"""Linear value-function baseline (Duan et al. 2016 style).

TPU-native equivalent of ``cherry.models.robotics.LinearValue`` — the
fitted baseline every reference RL trainer constructs (e.g.
``rl/maml_trpo.py:85``) and refits inside ``compute_advantages``
(``core_functions/rl.py:98-102``). The fit is a closed-form ridge
least-squares solve: one fused XLA op instead of torch LAPACK on host.

The feature map is ``[s, s^2, t/100, (t/100)^2, (t/100)^3, 1]``. The
reference (via cherry) uses the *flat replay row index* as ``t``, which
crosses episode boundaries when episodes are concatenated; here callers
pass explicit per-step timesteps, and the rollout layer supplies the
within-episode step index (the behavior Duan et al. intended). The fit is
never differentiated through, matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_value_features(states: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Build the polynomial feature matrix ``[N, 2*obs_dim + 4]``."""
    states = states.reshape(states.shape[0], -1)
    al = (jnp.asarray(timesteps, dtype=states.dtype).reshape(-1, 1)) / 100.0
    ones = jnp.ones_like(al)
    return jnp.concatenate([states, states**2, al, al**2, al**3, ones], axis=1)


def fit_linear_value(states: jnp.ndarray, timesteps: jnp.ndarray,
                     returns: jnp.ndarray, reg: float = 1e-5,
                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Ridge least-squares fit; returns weights ``[D, 1]``.

    Solves ``(F^T W F + reg*I) w = F^T W R``. ``weights`` (e.g. a validity
    mask for fixed-shape rollouts) lets padded steps drop out of the fit.
    Wrapped in ``stop_gradient`` so meta-gradients never flow through the
    fit (parity with the reference, where ``baseline.fit`` mutates weights
    outside autograd).
    """
    f = linear_value_features(states, timesteps)
    r = returns.reshape(-1, 1).astype(f.dtype)
    if weights is not None:
        sw = jnp.sqrt(weights.reshape(-1, 1).astype(f.dtype))
        f = f * sw
        r = r * sw
    a = f.T @ f + reg * jnp.eye(f.shape[1], dtype=f.dtype)
    b = f.T @ r
    w = jnp.linalg.solve(a, b)
    return jax.lax.stop_gradient(w)


def linear_value(weights: jnp.ndarray, states: jnp.ndarray,
                 timesteps: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the fitted baseline -> ``[N, 1]`` values."""
    return linear_value_features(states, timesteps) @ weights
