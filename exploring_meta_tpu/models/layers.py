"""Pure-functional NN layers (NHWC layout, TPU-friendly).

These replace torch modules with (params, x) -> y functions so MAML's
inner loop is just functional gradient descent on the params pytree.
BatchNorm uses per-batch statistics with no running-stat state: the
reference never calls ``model.eval()``, so its BN normalizes with batch
stats in every code path (``vision_models.py:168-175``) — the stateless
form is exactly equivalent and keeps models pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# MXU precision for convs/matmuls. "highest" = full f32 (3-pass bf16 on
# TPU) for accuracy parity with the f32 CPU/CUDA reference; switch to
# "default" (single-pass bf16) for throughput runs via set_precision().
_PRECISION = "highest"


def set_precision(mode: str) -> None:
    """Set MXU precision globally: "highest" (f32 parity) or "default"
    (bf16 single-pass, ~3x conv throughput on TPU)."""
    global _PRECISION
    assert mode in ("highest", "default", "high")
    _PRECISION = mode


def get_precision() -> str:
    return _PRECISION


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, p["w"], precision=_PRECISION) + p["b"]


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO kernel. ``x``: [N, H, W, C]."""
    y = lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_PRECISION,
    )
    return y + p["b"]


def batch_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Batch-statistics BN over (N, H, W) per channel, biased variance
    (torch training-mode semantics)."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + eps)
    return xn * p["scale"] + p["bias"]


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """MaxPool with ceil_mode=False (VALID), NHWC."""
    stride = stride or window
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def mlp_apply(layers: list, x: jnp.ndarray, activation) -> jnp.ndarray:
    """Apply a stack of linear layers with ``activation`` between all but
    the last (the reference policy-MLP shape, ``policies.py:40-45``)."""
    for p in layers[:-1]:
        x = activation(linear(p, x))
    return linear(layers[-1], x)
