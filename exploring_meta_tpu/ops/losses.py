"""Policy-gradient surrogate losses (A2C / PPO-clip / TRPO) and DiCE.

jnp one-liners replacing the ``cherry.algorithms.{a2c,ppo,trpo}`` losses
called throughout reference ``core_functions/rl.py`` (e.g. :226, :288,
:310, :469) and ``learn2learn.magic_box`` (rl.py:224). Sign conventions
follow cherry: all losses are minimized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _loss_mean(x: jnp.ndarray, valid) -> jnp.ndarray:
    """Plain mean (cherry semantics) or valid-weighted mean over the
    fixed-shape [T, E] trajectory layout (deviations registry D7)."""
    if valid is None:
        return jnp.mean(x)
    v = jnp.broadcast_to(valid, x.shape)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def a2c_policy_loss(log_probs: jnp.ndarray, advantages: jnp.ndarray,
                    valid=None) -> jnp.ndarray:
    """``-(log pi(a|s) * A).mean()`` — cherry ``a2c.policy_loss``;
    ``valid`` masks padded steps (rl/ callers)."""
    return -_loss_mean(log_probs * advantages, valid)


def ppo_policy_loss(new_log_probs: jnp.ndarray, old_log_probs: jnp.ndarray,
                    advantages: jnp.ndarray, clip: float = 0.1,
                    valid=None) -> jnp.ndarray:
    """Clipped importance-ratio surrogate — cherry ``ppo.policy_loss``;
    ``valid`` masks padded steps (rl/ callers)."""
    ratio = jnp.exp(new_log_probs - old_log_probs)
    obj = ratio * advantages
    obj_clip = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * advantages
    return -_loss_mean(jnp.minimum(obj, obj_clip), valid)


def trpo_policy_loss(new_log_probs: jnp.ndarray, old_log_probs: jnp.ndarray,
                     advantages: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Unclipped importance-ratio surrogate — cherry ``trpo.policy_loss``;
    ``valid`` masks padded steps (rl/ callers)."""
    ratio = jnp.exp(new_log_probs - old_log_probs)
    return -_loss_mean(ratio * advantages, valid)


def magic_box(x: jnp.ndarray) -> jnp.ndarray:
    """DiCE magic box ``exp(x - stop_grad(x))`` (l2l ``magic_box``).

    Value is 1 everywhere; gradient is the gradient of ``exp(x)`` evaluated
    at the stop-gradient point, which makes score-function terms appear in
    higher-order derivatives.
    """
    return jnp.exp(x - jax.lax.stop_gradient(x))


def weighted_cumsum(values: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Forward recurrence ``y_t = v_t + w_t * y_{t-1}`` used by the DiCE
    VPG variant (reference ``core_functions/rl.py:202-205``)."""
    def step(carry, xs):
        v, w = xs
        carry = v + w * carry
        return carry, carry

    init = jnp.zeros_like(values[0])
    _, out = jax.lax.scan(step, init, (values, weights))
    return out


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels.

    Equivalent of ``torch.nn.CrossEntropyLoss(reduction='mean')`` used by
    every vision trainer (e.g. reference ``vision/maml_vision.py:86``).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Classification accuracy (reference ``core_functions/vision.py:21-23``)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))
