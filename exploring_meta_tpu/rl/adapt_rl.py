"""Meta-RL algorithm core: VPG / PPO / TRPO fast-adaptation.

Functional rebuild of reference ``core_functions/rl.py:199-406``. Each
``fast_adapt_*`` interleaves on-policy rollouts with inner-loop parameter
updates, exactly like the reference, but as one traced program: rollouts
are ``lax.scan`` (device envs), updates are functional SGD, and the
returned query loss is differentiable for the outer step (PPO/VPG paths)
or paired with stored replays for TRPO's replay-and-rederive outer step
(see trpo_meta.py).

Masking: the reference's replays contain only real steps; our fixed-shape
trajectories carry a ``valid`` mask instead, and every reduction here is
valid-weighted. Sampled actions are stop-gradiented at collection
(rollout.py) so no reparameterization path leaks through the env —
matching torch's ``.sample()``.

ANIL (reference ``turn_off_body_grads``, policies.py:94-106): inner-loop
losses stop-gradient the body features AND the inner update only moves
head/sigma leaves; query losses use the full graph.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from exploring_meta_tpu.models.policies import DiagNormalPolicyANIL
from exploring_meta_tpu.ops.gae import compute_advantages, discount
from exploring_meta_tpu.ops.losses import (
    a2c_policy_loss, magic_box, ppo_policy_loss, weighted_cumsum,
)
from exploring_meta_tpu.ops.value import fit_linear_value, linear_value
from exploring_meta_tpu.rl.rollout import Trajectory


class RLConfig(NamedTuple):
    """Hyperparameters shared by the RL fast-adapt paths (the reference's
    per-script ``params`` dict, e.g. rl/maml_trpo.py:19-40)."""
    inner_lr: float = 0.1
    gamma: float = 0.99
    tau: float = 1.0
    adapt_steps: int = 1
    adapt_batch_size: int = 20    # episodes per rollout
    max_path_length: int = 100    # horizon
    ppo_epochs: int = 3
    ppo_clip_ratio: float = 0.3
    anil: bool = False
    first_order: bool = False
    flat_timestep: bool = False   # reference-exact LinearValue timestep:
                                  # cherry uses the flat concatenated-replay
                                  # row index (crossing episode boundaries)
                                  # as the baseline's time feature; the
                                  # default here is the within-episode index
                                  # (a measured improvement — PARITY.md
                                  # deviations registry). True = exact.
    value_reg: float = 1e-5       # LinearValue ridge coefficient. cherry's
                                  # default is 1e-5; the REFERENCE passes
                                  # env.action_size as the second positional
                                  # arg of LinearValue(input_size, reg=1e-5)
                                  # (rl/maml_trpo.py:85 etc.), accidentally
                                  # setting reg = action dim (2.0 on
                                  # Particles2D). Reference-exact parity
                                  # runs set this accordingly (PARITY.md
                                  # deviations registry D9).


def masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_normalize(x, mask, epsilon: float = 1e-8):
    """(x - mean)/(std + eps) over valid entries, Bessel-corrected
    (``ch.normalize`` on a real-steps-only replay)."""
    n = jnp.maximum(jnp.sum(mask), 2.0)
    mean = masked_mean(x, mask)
    var = jnp.sum(((x - mean) ** 2) * mask) / (n - 1.0)
    return (x - mean) / (jnp.sqrt(var) + epsilon)


def traj_advantages(traj: Trajectory, cfg: RLConfig, update_vf: bool = True,
                    baseline_w=None):
    """GAE advantages for a trajectory, fitting the linear baseline on
    discounted returns first (reference ``compute_advantages``,
    rl.py:95-110). -> (advantages [T,E], baseline_w)."""
    returns = discount(cfg.gamma, traj.reward, traj.done)
    flat_states = traj.flat(traj.state)
    if cfg.flat_timestep:
        # Reference-exact: cherry's LinearValue uses the row index of the
        # flat concatenated-episodes replay as its time feature, and the
        # SAME index for next-state values. Reconstruct it from episode
        # lengths: row(t, e) = sum(len(ep < e)) + t.
        lengths = jnp.sum(traj.valid, axis=0)
        offsets = (jnp.cumsum(lengths) - lengths).astype(traj.timestep.dtype)
        flat_t = traj.flat(traj.timestep + offsets[None, :])
        next_t = flat_t
    else:
        flat_t = traj.flat(traj.timestep)
        next_t = flat_t + 1
    if update_vf or baseline_w is None:
        baseline_w = fit_linear_value(flat_states, flat_t,
                                      traj.flat(returns),
                                      reg=cfg.value_reg,
                                      weights=traj.flat(traj.valid))
    shape = traj.reward.shape
    values = linear_value(baseline_w, flat_states, flat_t).reshape(shape)
    next_values = linear_value(baseline_w, traj.flat(traj.next_state),
                               next_t).reshape(shape)
    adv = compute_advantages(cfg.tau, cfg.gamma, traj.reward, traj.done,
                             values, next_values)
    return adv, baseline_w


def _log_prob(policy, params, traj: Trajectory, inner_anil: bool):
    """[T*E, 1] action log-probs (mean over action dims, the reference's
    policies.py:54-56 quirk)."""
    s = traj.flat(traj.state)
    a = traj.flat(traj.action)
    if inner_anil and isinstance(policy, DiagNormalPolicyANIL):
        return policy.log_prob(params, s, a, stop_body_grad=True)
    return policy.log_prob(params, s, a)


def policy_anil_mask(params) -> Any:
    """Trainable mask for ANIL policies: adapt head + sigma, freeze body."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(getattr(p, "key", None) in ("head", "sigma")
                            for p in path), params)


def _inner_update(policy, params, loss_fn, cfg: RLConfig):
    """One MAML inner step on an RL loss (reference ``trpo_update`` /
    ``learner.adapt``): ``p' = p - inner_lr * g`` with optional ANIL mask
    and first-order stop-gradient."""
    grads = jax.grad(loss_fn)(params)
    if cfg.first_order:
        grads = jax.lax.stop_gradient(grads)
    if cfg.anil:
        mask = policy_anil_mask(params)
        grads = jax.tree_util.tree_map(
            lambda m, g: jnp.where(m, g, jnp.zeros_like(g)), mask, grads)
    return jax.tree_util.tree_map(lambda p, g: p - cfg.inner_lr * g,
                                  params, grads)


# --------------------------------------------------------------------------
# A2C / VPG
# --------------------------------------------------------------------------

def vpg_a2c_loss(policy, params, traj: Trajectory, cfg: RLConfig,
                 inner_anil: bool = False, dice: bool = False):
    """Masked ``-(log pi * A).mean()`` with GAE advantages (reference
    ``vpg_a2c_loss``, rl.py:208-226; DiCE variant :219-224)."""
    log_probs = _log_prob(policy, params, traj, inner_anil)
    adv, _ = traj_advantages(traj, cfg)
    adv = traj.flat(adv)[:, None]
    valid = traj.flat(traj.valid)[:, None]
    if dice:
        # The DiCE recurrence runs over TIME within each episode: do it on
        # the [T, E] layout (the flat [T*E] axis interleaves episodes at
        # each timestep, which would chain log-probs across episodes).
        # Terminal flags are masked by `valid`: post-termination filler
        # steps repeat done=1 but are not episode boundaries, and the
        # reference's replays contain only real steps (its dones.sum() is
        # the episode count — rl.py:219-222).
        T, E = traj.reward.shape
        lp = log_probs.reshape(T, E)
        dones = traj.done * traj.valid
        weights = jnp.ones_like(dones)
        weights = weights.at[1:].add(-dones[:-1])
        weights = weights / jnp.maximum(jnp.sum(dones), 1.0)
        lp = magic_box(weighted_cumsum(lp, weights))
        log_probs = lp.reshape(T * E, 1)
    return a2c_policy_loss(log_probs, adv, valid=valid)


def fast_adapt_vpg(policy, params, rollout_fn: Callable, task, key,
                   cfg: RLConfig, dice: bool = False):
    """-> (adapted_params, differentiable query loss, query_rew,
    query_success_rate). Reference ``fast_adapt_vpg`` rl.py:229-254."""
    for _ in range(cfg.adapt_steps):
        key, k = jax.random.split(key)
        support = rollout_fn(params, task, k)
        loss_fn = lambda p: vpg_a2c_loss(policy, p, support, cfg,
                                         inner_anil=cfg.anil, dice=dice)
        params = _inner_update(policy, params, loss_fn, cfg)

    key, k = jax.random.split(key)
    query = rollout_fn(params, task, k)
    valid_loss = vpg_a2c_loss(policy, params, query, cfg)
    return params, valid_loss, _query_metrics(query)


def _query_metrics(query: Trajectory):
    rew = jnp.sum(query.reward * query.valid) / query.n_episodes
    suc = jnp.mean(query.episode_successes())
    return {"reward": rew, "success": suc}


# --------------------------------------------------------------------------
# PPO
# --------------------------------------------------------------------------

def _ppo_clip_loss(policy, params, traj, adv_flat, old_log_probs, cfg,
                   inner_anil: bool):
    new_lp = _log_prob(policy, params, traj, inner_anil)
    valid = traj.flat(traj.valid)[:, None]
    return ppo_policy_loss(new_lp, old_log_probs, adv_flat,
                           clip=cfg.ppo_clip_ratio, valid=valid)


def fast_adapt_ppo(policy, params, rollout_fn: Callable, task, key,
                   cfg: RLConfig):
    """PPO inner loop with differentiable query loss (reference
    ``fast_adapt_ppo`` rl.py:264-316; the outer Adam step differentiates
    through all ``ppo_epochs`` inner updates, maml_ppo.py:128-130)."""
    for _ in range(cfg.adapt_steps):
        key, k = jax.random.split(key)
        support = rollout_fn(params, task, k)
        adv, _ = traj_advantages(support, cfg)
        adv_flat = jax.lax.stop_gradient(
            masked_normalize(support.flat(adv), support.flat(support.valid))
        )[:, None]
        old_lp = jax.lax.stop_gradient(
            _log_prob(policy, params, support, cfg.anil))
        for _ in range(cfg.ppo_epochs):
            loss_fn = lambda p: _ppo_clip_loss(policy, p, support, adv_flat,
                                               old_lp, cfg, cfg.anil)
            params = _inner_update(policy, params, loss_fn, cfg)

    key, k = jax.random.split(key)
    query = rollout_fn(params, task, k)
    adv, _ = traj_advantages(query, cfg)
    adv_flat = jax.lax.stop_gradient(
        masked_normalize(query.flat(adv), query.flat(query.valid)))[:, None]
    old_lp = jax.lax.stop_gradient(_log_prob(policy, params, query, False))
    valid_loss = _ppo_clip_loss(policy, params, query, adv_flat, old_lp,
                                cfg, False)
    return params, valid_loss, _query_metrics(query)


# --------------------------------------------------------------------------
# TRPO inner loop (outer step in trpo_meta.py)
# --------------------------------------------------------------------------

def trpo_a2c_loss(policy, params, traj: Trajectory, cfg: RLConfig,
                  update_vf: bool = True, inner_anil: bool = False,
                  baseline_w=None):
    """A2C surrogate with *normalized, detached* advantages (reference
    ``trpo_a2c_loss`` rl.py:346-358). ``update_vf=False`` reuses the
    provided ``baseline_w`` (the reference's shared LinearValue keeps the
    fit from the last support batch); without one it falls back to
    fitting on this trajectory."""
    log_probs = _log_prob(policy, params, traj, inner_anil)
    adv, _ = traj_advantages(traj, cfg, update_vf=update_vf,
                             baseline_w=baseline_w)
    valid = traj.flat(traj.valid)[:, None]
    adv = jax.lax.stop_gradient(
        masked_normalize(traj.flat(adv), traj.flat(traj.valid)))[:, None]
    return a2c_policy_loss(log_probs, adv, valid=valid)


def single_adapt_step(algo: str, policy, params, support: Trajectory,
                      cfg: RLConfig, ppo_epochs: int = 1):
    """One inner adaptation step on an already-collected support
    trajectory, switched per algorithm — the reference's analysis-side
    inner updates (cl_rl.py:70-87, rc_rl.py:140-152: vpg ``adapt`` /
    ``single_ppo_update`` / ``trpo_update``), first-order.

    ``ppo_epochs``: clipped updates per call for ``algo="ppo"``. The
    reference is asymmetric here — its analysis-side ``single_ppo_update``
    performs exactly ONE clipped update (rl.py:319-336), while its
    training/eval ``fast_adapt_ppo`` runs ``params['ppo_epochs']`` of them
    per adapt step (rl.py:264-316). Default 1 = the analysis semantics;
    the batched collection/eval paths pass ``cfg.ppo_epochs`` to mirror
    ``fast_adapt_ppo`` (host_batched.py)."""
    if algo == "trpo":
        return trpo_update(policy, params, support, cfg, first_order=True)
    if algo == "vpg":
        loss_fn = lambda p: vpg_a2c_loss(policy, p, support, cfg,
                                         inner_anil=cfg.anil)
        return _inner_update(policy, params, loss_fn,
                             cfg._replace(first_order=True))
    if algo == "ppo":  # ppo_epochs clipped updates on this batch
        adv, _ = traj_advantages(support, cfg)
        adv_flat = jax.lax.stop_gradient(masked_normalize(
            support.flat(adv), support.flat(support.valid)))[:, None]
        old_lp = jax.lax.stop_gradient(
            _log_prob(policy, params, support, cfg.anil))
        for _ in range(ppo_epochs):
            loss_fn = lambda p: _ppo_clip_loss(policy, p, support, adv_flat,
                                               old_lp, cfg, cfg.anil)
            params = _inner_update(policy, params, loss_fn,
                                   cfg._replace(first_order=True))
        return params
    raise ValueError(f"unknown algo {algo!r}")


def trpo_update(policy, params, traj: Trajectory, cfg: RLConfig,
                first_order: bool | None = None, baseline_w=None):
    """One TRPO-style inner MAML step (reference ``trpo_update``
    rl.py:361-374). A pre-fitted ``baseline_w`` (from
    ``traj_advantages(traj, cfg)``) skips the redundant in-loss ridge
    fit — numerically identical, the fit is deterministic on (traj, cfg)
    and outside the gradient either way."""
    step_cfg = cfg if first_order is None else cfg._replace(
        first_order=first_order)
    loss_fn = lambda p: trpo_a2c_loss(policy, p, traj, step_cfg,
                                      inner_anil=step_cfg.anil,
                                      update_vf=baseline_w is None,
                                      baseline_w=baseline_w)
    return _inner_update(policy, params, loss_fn, step_cfg)


def fast_adapt_trpo(policy, params, rollout_fn: Callable, task, key,
                    cfg: RLConfig):
    """-> (adapted_params, valid_loss, replay [Trajectory x (steps+1)],
    query metrics). First-order inner updates during collection
    (reference rl/maml_trpo.py:113); the second-order graph is rebuilt by
    the outer step from the stored replay (rl.py:441-473)."""
    replay = []
    baseline_w = None
    for _ in range(cfg.adapt_steps):
        key, k = jax.random.split(key)
        support = rollout_fn(params, task, k)
        replay.append(support)
        # fit the value baseline ONCE per support batch: the inner update
        # uses it, and the reference's query loss reuses the last fit
        # (update_vf=False with its shared LinearValue)
        _, baseline_w = traj_advantages(support, cfg)
        params = trpo_update(policy, params, support, cfg, first_order=True,
                             baseline_w=baseline_w)

    key, k = jax.random.split(key)
    query = rollout_fn(params, task, k)
    replay.append(query)
    valid_loss = trpo_a2c_loss(policy, params, query, cfg, update_vf=False,
                               baseline_w=baseline_w)
    return params, valid_loss, replay, _query_metrics(query)


def trpo_collect_body(policy, rollout_fn: Callable, cfg: RLConfig):
    """UNJITTED vmapped first-order TRPO collection over a task batch:
    ``(params, tasks [B, ...], keys [B]) -> (adapted_params, valid_losses,
    stacked replays [B, steps+1, T, E, ...], query metrics)``.

    The single shared collection body — :func:`make_trpo_collect` jits it
    for the eager call sites, and the fused/sharded iteration bodies
    (rl/train_scan.py, parallel/mesh.py) inline it inside their scans —
    so the collection semantics cannot drift between any of them."""
    def collect(params, tasks_batch, keys):
        def per_task(task, k):
            adapted, loss, replay, m = fast_adapt_trpo(
                policy, params, rollout_fn, task, k, cfg)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *replay)
            return adapted, loss, stacked, m
        return jax.vmap(per_task)(tasks_batch, keys)
    return collect


def make_trpo_collect(policy, rollout_fn: Callable, cfg: RLConfig):
    """Jitted :func:`trpo_collect_body` (reference rl/maml_trpo.py:102-122:
    per-task deepcopy + fast_adapt) — the trainer iteration
    (trainers/rl.py), the parity harness (scripts/parity_check.py --rl
    trpo), the driver dryrun (__graft_entry__) and the tests all call
    this."""
    return jax.jit(trpo_collect_body(policy, rollout_fn, cfg))
