"""Parameter initializers with torch-parity semantics.

The reference relies on torch init functions (``vision_models.py:196-216``,
``policies.py:17-27``); meta-test accuracy parity requires matching their
distributions exactly: xavier-uniform with torch fan rules, N(0,1) heads,
U(0,1) BatchNorm scales, truncated normal on [-2, 2].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, fan_in: int, fan_out: int, gain: float = 1.0,
                   dtype=jnp.float32) -> jnp.ndarray:
    """torch ``nn.init.xavier_uniform_``: U(-a, a), a = gain*sqrt(6/(fi+fo))."""
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def truncated_normal(key, shape, mean: float = 0.0, std: float = 1.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Truncated normal on [-2, 2] then scaled — reference
    ``vision_models.py:210-216`` (used by ``fc_init_``)."""
    return mean + std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def linear_params(key, in_dim: int, out_dim: int, init: str = "xavier",
                  dtype=jnp.float32) -> dict:
    """Dense layer params ``{"w": [in, out], "b": [out]}``.

    ``init``:
      - ``"xavier"`` — xavier-uniform weight, zero bias (``maml_init_`` /
        ``linear_init``);
      - ``"normal"`` — N(0,1) weight, zero bias (OmniglotCNN head,
        ``vision_models.py:48-49``);
      - ``"trunc"`` — truncated normal std 0.01 (``fc_init_``).
    """
    kw, kb = jax.random.split(key)
    if init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim), in_dim, out_dim, dtype=dtype)
    elif init == "normal":
        w = jax.random.normal(kw, (in_dim, out_dim), dtype)
    elif init == "trunc":
        w = truncated_normal(kw, (in_dim, out_dim), std=0.01, dtype=dtype)
    elif init == "torch_default":
        # torch nn.Linear default: kaiming-uniform(a=sqrt(5)) weight and
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias (ANIL-vision head,
        # reference vision/anil_vision.py:94).
        bound_w = math.sqrt(1.0 / in_dim)
        w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound_w, bound_w)
        b = jax.random.uniform(kb, (out_dim,), dtype, -bound_w, bound_w)
        return {"w": w, "b": b}
    else:
        raise ValueError(f"unknown init {init!r}")
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def conv_params(key, k: int, in_ch: int, out_ch: int, dtype=jnp.float32) -> dict:
    """3x3 conv params ``{"w": [k, k, in, out] (HWIO), "b": [out]}`` with
    xavier-uniform weight / zero bias (``maml_init_``). torch fan rules:
    fan_in = in_ch*k*k, fan_out = out_ch*k*k."""
    w = xavier_uniform(key, (k, k, in_ch, out_ch),
                       fan_in=in_ch * k * k, fan_out=out_ch * k * k, dtype=dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}


def batchnorm_params(key, ch: int, dtype=jnp.float32) -> dict:
    """Affine BN params: scale ~ U(0,1) (reference ``vision_models.py:175``),
    zero shift."""
    return {"scale": jax.random.uniform(key, (ch,), dtype),
            "bias": jnp.zeros((ch,), dtype)}
