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

# Conv lowering for the stride-2 3x3 blocks (the Omniglot/ANIL CNN4 path,
# reference ``vision_models.py:149-193`` with ``max_pool=False``):
#   "direct" — lax.conv_general_dilated as written;
#   "s2d"    — space-to-depth reformulation: pad -> depth-to-space(2) ->
#              2x2 VALID conv over 4x input channels. Mathematically exact
#              (tested to f32 rounding); trades 16/9 the MACs for a
#              stride-free conv with a 4x fatter reduction dim, which maps
#              better onto the 128-lane MXU when C_in <= 64.
_CONV_IMPL = "direct"


def set_precision(mode: str) -> None:
    """Set MXU precision globally: "highest" (f32 parity) or "default"
    (bf16 single-pass, ~3x conv throughput on TPU)."""
    global _PRECISION
    assert mode in ("highest", "default", "high")
    _PRECISION = mode


def get_precision() -> str:
    return _PRECISION


def set_conv_impl(mode: str) -> None:
    """Select the stride-2 conv lowering: "direct" | "s2d" (see above) |
    "pallas" (fused whole-base Pallas kernels for the Omniglot-shaped
    CNN4 — pallas/cnn4_pallas.py; specs the kernel does not cover fall
    back to "direct" per-op lowering)."""
    global _CONV_IMPL
    assert mode in ("direct", "s2d", "pallas")
    _CONV_IMPL = mode


def get_conv_impl() -> str:
    return _CONV_IMPL


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, p["w"], precision=_PRECISION) + p["b"]


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO kernel. ``x``: [N, H, W, C]."""
    if stride == 2 and p["w"].shape[0] == 3 and _CONV_IMPL == "s2d":
        return _conv2d_s2d(p, x, padding)
    y = lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_PRECISION,
    )
    return y + p["b"]


def _s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Scatter a [3, 3, Ci, Co] kernel into the [2, 2, 4*Ci, Co] kernel of
    the space-to-depth conv: output pixel y reads padded rows 2y+dy, which
    land at s2d row y + dy//2, parity dy%2 (same for columns). 7 of the 16
    (parity_y, parity_x) tap slots stay zero."""
    _, _, ci, co = w.shape
    w2 = jnp.zeros((2, 2, 2, 2, ci, co), w.dtype)
    for dy in range(3):
        for dx in range(3):
            w2 = w2.at[dy // 2, dx // 2, dy % 2, dx % 2].set(w[dy, dx])
    return w2.reshape(2, 2, 4 * ci, co)


def _conv2d_s2d(p: dict, x: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Stride-2 3x3 conv as pad -> space-to-depth(2) -> 2x2 VALID conv.

    Exact reformulation (tested to f32 rounding in test_models.py): the
    padded input is regrouped into 2x2 blocks stacked on the channel axis,
    after which every output pixel is a 2x2 window — a stride-free conv
    whose reduction dim is 4x the original, i.e. MXU-shaped for the small
    C_in of the CNN4 blocks. Odd padded extents get one extra zero row/col,
    which only feeds the zero tap slots."""
    n, h, wd, c = x.shape
    ph, pw = h + 2 * padding, wd + 2 * padding
    xp = jnp.pad(x, ((0, 0), (padding, padding + ph % 2),
                     (padding, padding + pw % 2), (0, 0)))
    ph += ph % 2
    pw += pw % 2
    xs = xp.reshape(n, ph // 2, 2, pw // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, ph // 2, pw // 2, 4 * c)
    y = lax.conv_general_dilated(
        xs, _s2d_kernel(p["w"]),
        window_strides=(1, 1), padding="VALID",
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
