"""Conjugate gradient and Hessian-vector products, fully jittable.

Replaces ``cherry.algorithms.trpo.{hessian_vector_product,
conjugate_gradient}`` (reference ``core_functions/rl.py:417-418``,
``baselines/trpo.py:165-167``). The reference runs CG as an eager torch
loop with one autograd ``grad(grad)`` per iteration; here the HVP is a
single ``jax.jvp`` through ``jax.grad`` and CG is a ``lax.while_loop``, so
TRPO's natural-gradient step compiles into one XLA program.

Functions operate on flat vectors; ``tree_hvp`` adapts pytree params via
``ravel_pytree``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


def conjugate_gradient(Ax: Callable[[jnp.ndarray], jnp.ndarray],
                       b: jnp.ndarray,
                       num_iterations: int = 10,
                       tol: float = 1e-10) -> jnp.ndarray:
    """Solve ``A x = b`` for SPD ``A`` given only ``v -> A v``.

    Same update rule and defaults as cherry's implementation (x0 = 0,
    early exit when the residual norm-squared drops below ``tol``).
    """
    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = b
    rdotr0 = jnp.vdot(r0, r0)

    def cond(state):
        i, _, _, _, rdotr = state
        return jnp.logical_and(i < num_iterations, rdotr >= tol)

    def body(state):
        i, x, r, p, rdotr = state
        ap = Ax(p)
        alpha = rdotr / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        new_rdotr = jnp.vdot(r, r)
        p = r + (new_rdotr / rdotr) * p
        return i + 1, x, r, p, new_rdotr

    _, x, _, _, _ = lax.while_loop(cond, body, (0, x0, r0, p0, rdotr0))
    return x


def hvp(f: Callable[[jnp.ndarray], jnp.ndarray],
        x: jnp.ndarray,
        damping: float = 1e-5) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Damped Hessian-vector product of scalar ``f`` at flat vector ``x``.

    ``v -> H v + damping * v`` via forward-over-reverse ``jvp(grad(f))`` —
    one combined pass instead of cherry's grad-of-grad per CG iteration.
    """
    grad_f = jax.grad(f)

    def Ax(v):
        _, hv = jax.jvp(grad_f, (x,), (v,))
        return hv + damping * v

    return Ax


def tree_hvp(f: Callable, params, damping: float = 1e-5):
    """Pytree version: returns ``(Ax, flat_params, unravel)`` where ``Ax``
    maps flat vectors through the damped Hessian of ``f`` at ``params``."""
    flat, unravel = ravel_pytree(params)

    def f_flat(v):
        return f(unravel(v))

    return hvp(f_flat, flat, damping=damping), flat, unravel
