"""Fused GAE Pallas kernel: one VMEM pass for the whole advantage pipeline.

The XLA path (ops/gae.py) lowers GAE to two chained ``lax.scan``s
(TD-errors then reverse discount) with [T, E] intermediates round-tripping
through HBM. This kernel fuses the recurrences into ONE reverse sweep held
entirely in VMEM:

    a_t = (r_t + gamma*(1-d_t)*V_{t+1} - V_t) + gamma*tau*(1-d_t)*a_{t+1}

vectorized across a lane axis that packs all parallel sequences
(envs x tasks), padded to the 128-lane VPU width. Time stays sequential —
it's a true recurrence — but each step is a fully-vectorized VPU op with
no HBM traffic.

On CPU backends the kernel runs in interpreter mode (tests); numerics are
verified against the ops/gae.py reference in tests/test_pallas.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _gae_kernel(gamma, tau, r_ref, d_ref, v_ref, out_ref):
    T = r_ref.shape[0]

    def body(i, carry):
        t = T - 1 - i
        not_done = 1.0 - d_ref[t, :]
        # clamp the load index: at t == T-1 the where discards the value,
        # but v_ref[T] itself would be an out-of-bounds read (undefined in
        # pallas; today's Mosaic clamps, a future version may fault)
        next_v = jnp.where(t == T - 1, jnp.zeros_like(carry),
                           v_ref[jnp.minimum(t + 1, T - 1), :])
        td = r_ref[t, :] + gamma * not_done * next_v - v_ref[t, :]
        carry = td + gamma * tau * not_done * carry
        out_ref[t, :] = carry
        return carry

    jax.lax.fori_loop(0, T, body, jnp.zeros((r_ref.shape[1],), jnp.float32))


def _discount_kernel(gamma, r_ref, d_ref, out_ref):
    T = r_ref.shape[0]

    def body(i, carry):
        t = T - 1 - i
        carry = r_ref[t, :] + gamma * carry * (1.0 - d_ref[t, :])
        out_ref[t, :] = carry
        return carry

    jax.lax.fori_loop(0, T, body, jnp.zeros((r_ref.shape[1],), jnp.float32))


def _run_lanes(kernel, args, T: int, n: int):
    """Pad the lane axis to 128 and invoke the kernel over [T, lanes]."""
    pad = (-n) % _LANES
    padded = [jnp.pad(a, ((0, 0), (0, pad))) for a in args]
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, n + pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*padded)
    return out[:, :n]


def _flatten_time_major(x):
    """[T] or [T, ...] -> ([T, N] f32, restore_fn)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        return x[:, None], lambda y: y[:, 0]
    shape = x.shape
    flat = x.reshape(shape[0], -1)
    return flat, lambda y: y.reshape(shape)


def _make_batch_rule(fn):
    """custom_vmap rule: fold the vmapped axis into the trailing lane axis
    (the kernel vectorizes over lanes), instead of letting pallas_call's
    default batching insert a grid dimension that violates TPU tiling."""

    def rule(axis_size, in_batched, *args):
        def prep(x, batched):
            if batched:
                return jnp.moveaxis(x, 0, -1)
            return jnp.broadcast_to(x[..., None], x.shape + (axis_size,))

        moved = [prep(x, b) for x, b in zip(args, in_batched)]
        out = fn(*moved)
        return jnp.moveaxis(out, -1, 0), True

    return rule


def _xla_gae(gamma, tau, r, d, v):
    from exploring_meta_tpu.ops import gae as _gae
    return _gae.generalized_advantage(gamma, tau, r, d, v, 0.0,
                                      use_pallas=False)


def _xla_discount(gamma, r, d):
    from exploring_meta_tpu.ops import gae as _gae
    return _gae.discount(gamma, r, d, use_pallas=False)


@lru_cache(maxsize=None)
def _build_gae(gamma: float, tau: float):
    """Per-(gamma, tau) fused GAE with custom VJP (backward reruns the XLA
    formulation — GAE inputs are normally stop-gradient rollout data, so
    this path is rarely taken) and custom vmap (batch -> lanes)."""

    @jax.custom_vjp
    def core(r, d, v):
        rf, restore = _flatten_time_major(r)
        df, _ = _flatten_time_major(d)
        vf, _ = _flatten_time_major(v)
        out = _run_lanes(partial(_gae_kernel, gamma, tau), (rf, df, vf),
                         rf.shape[0], rf.shape[1])
        return restore(out)

    def fwd(r, d, v):
        return core(r, d, v), (r, d, v)

    def bwd(res, g):
        r, d, v = res
        _, vjp = jax.vjp(lambda rr, dd, vv: _xla_gae(gamma, tau, rr, dd, vv),
                         r, d, v)
        return vjp(g)

    core.defvjp(fwd, bwd)

    wrapped = jax.custom_batching.custom_vmap(core)
    wrapped.def_vmap(_make_batch_rule(core))
    return wrapped


@lru_cache(maxsize=None)
def _build_discount(gamma: float):
    @jax.custom_vjp
    def core(r, d):
        rf, restore = _flatten_time_major(r)
        df, _ = _flatten_time_major(d)
        out = _run_lanes(partial(_discount_kernel, gamma), (rf, df),
                         rf.shape[0], rf.shape[1])
        return restore(out)

    def fwd(r, d):
        return core(r, d), (r, d)

    def bwd(res, g):
        r, d = res
        _, vjp = jax.vjp(lambda rr, dd: _xla_discount(gamma, rr, dd), r, d)
        return vjp(g)

    core.defvjp(fwd, bwd)

    wrapped = jax.custom_batching.custom_vmap(core)
    wrapped.def_vmap(_make_batch_rule(core))
    return wrapped


def gae_pallas(gamma: float, tau: float, rewards, dones, values):
    """Fused GAE(gamma, tau) with terminal next-value 0 — drop-in for
    ``ops.generalized_advantage(gamma, tau, rewards, dones, values, 0.0)``."""
    return _build_gae(float(gamma), float(tau))(rewards, dones, values)


def discount_pallas(gamma: float, rewards, dones):
    """Fused discounted returns — drop-in for ``ops.discount``
    (zero bootstrap)."""
    return _build_discount(float(gamma))(rewards, dones)
