"""Small statistical helpers mirroring ``cherry`` utilities."""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """``(x - mean) / (std + eps)`` with Bessel-corrected std.

    Matches ``ch.normalize`` (reference ``core_functions/rl.py:278,355``);
    torch's ``std()`` is unbiased, hence ``ddof=1``.
    """
    if x.size <= 1:
        # cherry: `if tensor.numel() <= 1: return tensor` — a length-1
        # "advantage" passes through unchanged, not zeroed.
        return x
    return (x - jnp.mean(x)) / (jnp.std(x, ddof=1) + epsilon)


def onehot(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Integer states -> one-hot rows (``ch.onehot``, reference
    ``core_functions/policies.py:263``)."""
    flat = jnp.asarray(x, dtype=jnp.int32).reshape(-1)
    return (flat[:, None] == jnp.arange(dim)[None, :]).astype(jnp.float32)
