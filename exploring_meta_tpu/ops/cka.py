"""Centered Kernel Alignment (linear and RBF) in JAX.

Equivalent of the reference's vendored CKA (``utils/cka.py``, used by the
representation-change probes in ``misc_scripts/rc_*.py``). Inputs are
``(datapoints, features)`` matrices. Everything is matmuls — ideal MXU
work — so these run as single fused XLA programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _center(gram: jnp.ndarray) -> jnp.ndarray:
    """Double-center a Gram matrix: ``H K H`` with ``H = I - 11^T/n``."""
    n = gram.shape[0]
    h = jnp.eye(n, dtype=gram.dtype) - jnp.ones((n, n), dtype=gram.dtype) / n
    return h @ gram @ h


def _rbf_gram(x: jnp.ndarray, sigma: float | None = None) -> jnp.ndarray:
    gx = x @ x.T
    # pairwise squared distances: d_i + d_j - 2*g_ij (the reference's
    # `diag(GX) - GX + (diag(GX) - GX).T` — its 1-D diag broadcasts as a
    # ROW, so the two terms differ and sum to the symmetric form)
    diag = jnp.diag(gx)
    sq_dists = diag[:, None] + diag[None, :] - 2.0 * gx
    if sigma is None:
        # median-heuristic bandwidth over nonzero distances, jit-safe
        # (boolean-mask indexing would fail under trace)
        med = jnp.nanmedian(jnp.where(sq_dists > 0, sq_dists, jnp.nan))
        sigma_sq = jnp.where(jnp.isnan(med), 1.0, med)
    else:
        sigma_sq = jnp.asarray(sigma) ** 2
    return jnp.exp(-0.5 * sq_dists / sigma_sq)


def _hsic_linear(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(_center(x @ x.T) * _center(y @ y.T))


def _hsic_kernel(x: jnp.ndarray, y: jnp.ndarray, sigma) -> jnp.ndarray:
    return jnp.sum(_center(_rbf_gram(x, sigma)) * _center(_rbf_gram(y, sigma)))


def get_linear_CKA(x, y) -> jnp.ndarray:
    """Linear CKA similarity in [0, 1]."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    hsic = _hsic_linear(x, y)
    return hsic / (jnp.sqrt(_hsic_linear(x, x)) * jnp.sqrt(_hsic_linear(y, y)))


def get_kernel_CKA(x, y, sigma: float | None = None) -> jnp.ndarray:
    """RBF-kernel CKA similarity (median-heuristic bandwidth by default)."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    hsic = _hsic_kernel(x, y, sigma)
    return hsic / (jnp.sqrt(_hsic_kernel(x, x, sigma)) *
                   jnp.sqrt(_hsic_kernel(y, y, sigma)))
