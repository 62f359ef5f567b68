"""Fused meta-RL training: whole iterations under ``lax.scan``.

Device envs (Particles2D) make the ENTIRE meta-RL iteration a pure
function — task sampling, vmapped rollouts + inner adaptation, and the
outer step (TRPO natural gradient or Adam) — so ``n_steps`` iterations
fuse into ONE XLA program with zero host round-trips in between. This is
the end state of the reference's per-step subprocess loop
(``rl/maml_trpo.py:92-134``) rewritten TPU-first: the training loop itself
lives on the device.

Used by ``trainers/rl.py`` ``--fuse N`` (device envs) and the
``trpo_particles`` benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exploring_meta_tpu.rl.adapt_rl import (
    RLConfig, fast_adapt_ppo, fast_adapt_trpo, fast_adapt_vpg,
    trpo_collect_body,
)
from exploring_meta_tpu.rl.trpo_meta import TRPOConfig, meta_optimize_trpo


def make_trpo_train_scan(env, policy, rollout_fn, cfg: RLConfig,
                         trpo_cfg: TRPOConfig, meta_batch_size: int,
                         n_steps: int):
    """-> ``train(params, key) -> (params, metrics)`` running ``n_steps``
    full MAML-TRPO meta-iterations (first-order collection + second-order
    CG/line-search outer step) in one program; metrics leaves are stacked
    ``[n_steps]``."""

    collect = trpo_collect_body(policy, rollout_fn, cfg)

    def one_iteration(params, key):
        k_tasks, k_adapt = jax.random.split(key)
        tasks_batch = env.sample_tasks(k_tasks, meta_batch_size)
        keys = jax.random.split(k_adapt, meta_batch_size)
        old_params, _, replays, ms = collect(params, tasks_batch, keys)
        params, info = meta_optimize_trpo(policy, params, old_params,
                                          replays, cfg, trpo_cfg,
                                          cfg.adapt_steps)
        return params, {
            "adapt_reward": jnp.mean(ms["reward"]),
            "adapt_success": jnp.mean(ms["success"]),
            "meta_loss": info["old_loss"],
            "ls_accepted": info["accepted"].astype(jnp.float32),
        }

    @jax.jit
    def train(params, key):
        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(one_iteration, params, keys)

    return train


def make_adam_train_scan(env, policy, rollout_fn, cfg: RLConfig, optimizer,
                         algo: str, meta_batch_size: int, n_steps: int):
    """-> ``train(params, opt_state, key) -> (params, opt_state, metrics)``
    for the PPO/VPG meta-paths (Adam through the differentiable query
    losses, reference ``rl/maml_ppo.py:128-130``)."""
    import optax

    fast_adapt = {"ppo": fast_adapt_ppo, "vpg": fast_adapt_vpg}[algo]

    def one_iteration(carry, key):
        params, opt_state = carry
        k_tasks, k_adapt = jax.random.split(key)
        tasks_batch = env.sample_tasks(k_tasks, meta_batch_size)
        keys = jax.random.split(k_adapt, meta_batch_size)

        def batch_loss(p):
            def task_loss(task, k):
                _, loss, m = fast_adapt(policy, p, rollout_fn, task, k, cfg)
                return loss, m
            losses, ms = jax.vmap(task_loss)(tasks_batch, keys)
            return jnp.mean(losses), ms

        (loss, ms), grads = jax.value_and_grad(batch_loss,
                                               has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {
            "meta_loss": loss,
            "adapt_reward": jnp.mean(ms["reward"]),
            "adapt_success": jnp.mean(ms["success"]),
        }

    @jax.jit
    def train(params, opt_state, key):
        keys = jax.random.split(key, n_steps)
        (params, opt_state), metrics = jax.lax.scan(
            one_iteration, (params, opt_state), keys)
        return params, opt_state, metrics

    return train
