"""TRPO meta-optimization: natural-gradient outer step, fully jitted.

Rebuild of reference ``meta_optimize_trpo`` + ``meta_surrogate_loss``
(``core_functions/rl.py:409-473``): the surrogate re-runs every task's
inner adaptation from stored replays with a second-order graph, the step
direction is a conjugate-gradient solve against the Fisher (Hessian of
mean KL), scaled to the trust region, then accepted by a backtracking
line search.

The reference evaluates this as eager torch: one autograd graph per
surrogate evaluation, grad-of-grad per CG iteration, and a ``deepcopy``
of the policy per line-search step. Here the whole thing — surrogate
(vmapped over tasks), HVP (``jvp`` of ``grad``), CG and line search
(``lax.while_loop``) — compiles into a single XLA program; candidate
parameters are just pytrees.

Replays are Trajectory pytrees stacked over a leading task axis
(``stack_replays``), so the per-task re-adaptation runs batched under
``vmap`` instead of the reference's sequential task loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from exploring_meta_tpu.models.distributions import normal_kl
from exploring_meta_tpu.ops.cg import conjugate_gradient
from exploring_meta_tpu.ops.losses import trpo_policy_loss
from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig, masked_mean, masked_normalize, traj_advantages, trpo_update,
)
from exploring_meta_tpu.rl.rollout import Trajectory


class TRPOConfig(NamedTuple):
    """Outer-step hyperparameters (reference rl/maml_trpo.py:19-40)."""
    outer_lr: float = 0.1
    max_kl: float = 0.01
    ls_max_steps: int = 15
    backtrack_factor: float = 0.5
    cg_iterations: int = 10
    damping: float = 1e-5


def stack_replays(per_task_replays):
    """list over tasks of list over (adapt_steps+1) Trajectories ->
    single Trajectory pytree with leading [n_tasks, n_steps] axes."""
    per_task = [jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *r)
                for r in per_task_replays]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_task)


def meta_surrogate_loss(policy, params, old_params_stack, replays,
                        cfg: RLConfig, adapt_steps: int):
    """-> (mean surrogate loss, mean KL) over tasks (reference
    ``meta_surrogate_loss`` rl.py:441-473).

    ``replays``: Trajectory with leading [n_tasks, adapt_steps+1] axes;
    index -1 on the second axis is the query set. ``old_params_stack``:
    the adapted policies from collection time, stacked over tasks.
    """

    def per_task(old_params, task_replays):
        new_params = params
        # Re-run inner adaptation with the full second-order graph.
        for i in range(adapt_steps):
            support = jax.tree_util.tree_map(lambda x: x[i], task_replays)
            new_params = trpo_update(policy, new_params, support, cfg,
                                     first_order=False)

        query: Trajectory = jax.tree_util.tree_map(lambda x: x[-1],
                                                   task_replays)
        states = query.flat(query.state)
        actions = query.flat(query.action)
        valid = query.flat(query.valid)[:, None]

        old_loc, old_scale = policy.density(old_params, states)
        new_loc, new_scale = policy.density(new_params, states)

        kl = masked_mean(
            normal_kl(new_loc, new_scale, old_loc, old_scale),
            jnp.broadcast_to(valid, new_loc.shape))

        adv, _ = traj_advantages(query, cfg)
        adv = jax.lax.stop_gradient(
            masked_normalize(query.flat(adv), query.flat(query.valid)))[:, None]

        from exploring_meta_tpu.models.distributions import normal_log_prob
        old_lp = jax.lax.stop_gradient(
            jnp.mean(normal_log_prob(old_loc, old_scale, actions),
                     axis=-1, keepdims=True))
        new_lp = jnp.mean(normal_log_prob(new_loc, new_scale, actions),
                          axis=-1, keepdims=True)
        surrogate = trpo_policy_loss(new_lp, old_lp, adv, valid=valid)
        return surrogate, kl

    losses, kls = jax.vmap(per_task)(old_params_stack, replays)
    return jnp.mean(losses), jnp.mean(kls)


def meta_optimize_trpo(policy, params, old_params_stack, replays,
                       cfg: RLConfig, trpo_cfg: TRPOConfig,
                       adapt_steps: int):
    """One TRPO outer step; returns updated params (reference
    ``meta_optimize_trpo`` rl.py:409-438). Jittable: call through
    :func:`make_trpo_meta_step` for the cached-compilation version."""
    flat0, unravel = ravel_pytree(params)

    def loss_kl(flat):
        return meta_surrogate_loss(policy, unravel(flat), old_params_stack,
                                   replays, cfg, adapt_steps)

    old_loss, grad_flat = jax.value_and_grad(lambda f: loss_kl(f)[0])(flat0)

    kl_fn = lambda f: loss_kl(f)[1]
    grad_kl = jax.grad(kl_fn)

    def Fvp(v):
        _, hv = jax.jvp(grad_kl, (flat0,), (v,))
        return hv + trpo_cfg.damping * v

    step = conjugate_gradient(Fvp, grad_flat,
                              num_iterations=trpo_cfg.cg_iterations)
    shs = 0.5 * jnp.dot(step, Fvp(step))
    lagrange = jnp.sqrt(shs / trpo_cfg.max_kl)
    step = step / lagrange

    # Backtracking line search (reference rl.py:429-438): accept the first
    # candidate that improves the surrogate while respecting the KL bound.
    def cond(state):
        ls_step, accepted, _ = state
        return jnp.logical_and(ls_step < trpo_cfg.ls_max_steps,
                               jnp.logical_not(accepted))

    def body(state):
        ls_step, _, cur = state
        stepsize = (trpo_cfg.backtrack_factor ** ls_step) * trpo_cfg.outer_lr
        candidate = flat0 - stepsize * step
        new_loss, kl = loss_kl(candidate)
        ok = jnp.logical_and(new_loss < old_loss, kl < trpo_cfg.max_kl)
        cur = jnp.where(ok, candidate, cur)
        return ls_step + 1, ok, cur

    _, accepted, final_flat = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), bool), flat0))
    return unravel(final_flat), {"old_loss": old_loss, "accepted": accepted}


def make_trpo_meta_step(policy, cfg: RLConfig, trpo_cfg: TRPOConfig,
                        adapt_steps: int):
    """jit-cached ``(params, old_params_stack, replays) -> (params, info)``."""

    @jax.jit
    def step(params, old_params_stack, replays):
        return meta_optimize_trpo(policy, params, old_params_stack, replays,
                                  cfg, trpo_cfg, adapt_steps)

    return step
