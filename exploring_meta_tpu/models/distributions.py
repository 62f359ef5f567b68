"""Diagonal-Gaussian and categorical distribution math.

Replaces ``torch.distributions.Normal``/``Categorical`` and
``kl_divergence`` as used by the reference policies
(``core_functions/policies.py``) and TRPO surrogate
(``core_functions/rl.py:459-461``). All are elementwise jnp — they fuse
into the surrounding policy programs under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_log_prob(loc: jnp.ndarray, scale: jnp.ndarray,
                    value: jnp.ndarray) -> jnp.ndarray:
    """Per-dimension Gaussian log density (same as torch Normal.log_prob)."""
    var = scale ** 2
    return -((value - loc) ** 2) / (2 * var) - jnp.log(scale) - _LOG_SQRT_2PI


def normal_sample(key, loc: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return loc + scale * jax.random.normal(key, loc.shape, loc.dtype)


def normal_kl(loc_p, scale_p, loc_q, scale_q) -> jnp.ndarray:
    """Per-dimension KL(p || q) for diagonal Gaussians
    (torch ``kl_divergence(Normal_p, Normal_q)`` semantics)."""
    var_ratio = (scale_p / scale_q) ** 2
    t1 = ((loc_p - loc_q) / scale_q) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def categorical_sample(key, logits: jnp.ndarray) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, value[..., None].astype(jnp.int32), axis=-1)[..., 0]
