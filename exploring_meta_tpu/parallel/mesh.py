"""Task-data-parallel meta-training over a TPU device mesh.

The reference processes its meta-batch as a sequential Python loop on one
device (``vision/maml_vision.py:102-141``). Here the task axis is a mesh
axis: each chip runs ``meta_batch / n_devices`` inner loops under ``vmap``
inside ``shard_map``, local mean-gradients are reduced with ``psum`` over
the ICI, and every chip applies the identical optimizer update to its
replicated params — the TPU-native form of the reference's
grad-accumulate + ``p.grad.mul_(1/B)`` + shared Adam step.

No TP/PP/EP is needed at CNN4 scale (SURVEY.md §2.3): the models are tiny
and replicated; all bandwidth goes to the task axis. The mesh abstraction
(one named ``tasks`` axis today) is where those axes would be added.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_task_mesh(n_devices: int | None = None, axis: str = "tasks") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    import numpy as np
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n < 1:
        raise ValueError(f"mesh needs >= 1 device, got {n}")
    if n > len(devs):
        # Never truncate silently: a --mesh larger than the machine would
        # otherwise shrink the effective meta-batch with no warning.
        raise ValueError(f"requested a {n}-device mesh but only "
                         f"{len(devs)} devices are available")
    return Mesh(np.array(devs[:n]), (axis,))


def make_sharded_meta_step(fast_adapt: Callable,
                           optimizer: optax.GradientTransformation,
                           mesh: Mesh, axis: str = "tasks"):
    """Sharded version of :func:`exploring_meta_tpu.adapt.make_meta_step`.

    ``fast_adapt(params, *task) -> TaskResult``. The returned
    ``meta_step(params, opt_state, *task_batch)`` expects ``task_batch``
    leaves with a leading meta-batch axis divisible by the mesh size;
    params/opt_state are replicated.
    """
    def local_step(params, opt_state, *task_batch):
        def batch_loss(p, *tb):
            results = jax.vmap(lambda *t: fast_adapt(p, *t))(*tb)
            # Local mean; psum/mesh-size below completes the global mean.
            return (jnp.mean(results.loss),
                    jnp.mean(results.metric))

        (loss, metric), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, *task_batch)
        # Cross-chip reduction over ICI — the distributed analog of the
        # reference's gradient averaging (vision/maml_vision.py:139-141).
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metric = jax.lax.pmean(metric, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "metric": metric}

    def sharded(params, opt_state, *task_batch):
        n_args = len(task_batch)
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P()) + (P(axis),) * n_args,
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return fn(params, opt_state, *task_batch)

    return jax.jit(sharded)


def make_sharded_train_scan(fast_adapt: Callable,
                            optimizer: optax.GradientTransformation,
                            sample_local: Callable, n_steps: int,
                            mesh: Mesh, axis: str = "tasks",
                            eval_sample_local: Callable | None = None):
    """Multi-chip AND multi-iteration fusion: ``n_steps`` whole sharded
    meta-iterations in ONE XLA program.

    Each chip samples its own shard of the meta-batch on device
    (``sample_local(key, *data) -> local task batch``, with the step key
    folded by mesh position so shards draw disjoint tasks), runs its
    inner loops under ``vmap``, and the outer gradient is ``pmean``-reduced
    over ICI — then ``lax.scan`` repeats the whole thing with zero host
    involvement. Params/opt-state stay replicated; ``*data`` (the packed
    dataset) is replicated too.

    Equivalent to per-iteration :func:`make_sharded_meta_step` on the
    concatenation of the shards' samples (equal shard sizes make the
    pmean-of-local-means the global mean); see
    tests/test_mesh.py::test_sharded_train_scan_equals_global_step.

    Returns ``train(params, opt_state, key, *data) -> (params, opt_state,
    metrics)`` with metrics leaves stacked ``[n_steps]``.
    """
    def local_step(params, opt_state, step_key, *data):
        shard_idx = jax.lax.axis_index(axis)
        if eval_sample_local is None:
            k_tr = step_key
        else:
            k_tr, k_va = jax.random.split(step_key)
        shard_key = jax.random.fold_in(k_tr, shard_idx)
        task_batch = sample_local(shard_key, *data)

        def batch_loss(p, *tb):
            results = jax.vmap(lambda *t: fast_adapt(p, *t))(*tb)
            return jnp.mean(results.loss), jnp.mean(results.metric)

        (loss, metric), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, *task_batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metric = jax.lax.pmean(metric, axis)
        out = {"loss": loss, "metric": metric}
        if eval_sample_local is not None:
            # PRE-update params: the reference's valid pass runs before
            # opt.step() (vision/maml_vision.py:117-141)
            vb = eval_sample_local(jax.random.fold_in(k_va, shard_idx),
                                   *data)
            v_loss, v_metric = batch_loss(params, *vb)
            out["valid_loss"] = jax.lax.pmean(v_loss, axis)
            out["valid_metric"] = jax.lax.pmean(v_metric, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, out

    @jax.jit
    def train(params, opt_state, key, *data):
        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P()) + (P(),) * len(data),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

        def one_step(carry, step_key):
            params, opt_state = carry
            params, opt_state, m = sharded(params, opt_state, step_key,
                                           *data)
            return (params, opt_state), m

        keys = jax.random.split(key, n_steps)
        (params, opt_state), metrics = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, metrics

    return train


def shard_task_batch(mesh: Mesh, task_batch, axis: str = "tasks"):
    """Place a host task batch with its leading axis sharded over the mesh.

    Raises a friendly error on non-divisible batches here — ``device_put``
    itself would accept uneven shards and the failure would only surface
    later as a cryptic ``shard_map`` tracing error inside the sharded
    step (the fused factories validate at build time; this is the
    per-iteration paths' equivalent)."""
    n_shards = mesh.shape[axis]
    lead = jax.tree_util.tree_leaves(task_batch)[0].shape[0]
    if lead % n_shards:
        raise ValueError(
            f"task batch size {lead} not divisible by mesh axis "
            f"{axis!r} size {n_shards}")
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), task_batch)


def _make_local_trpo_outer(policy, cfg, trpo_cfg, adapt_steps: int,
                           axis: str):
    """Per-shard body of the distributed TRPO outer step (must run inside
    ``shard_map`` over ``axis``): re-derives the second-order surrogate on
    the local replay shard, ``pmean``-reduces every cross-device quantity,
    and runs the CG solve + backtracking line search replicated on every
    chip with identical global values. Shared by
    :func:`make_sharded_trpo_meta_step` (per-iteration) and
    :func:`make_sharded_trpo_train_scan` (fused iterations)."""
    from jax.flatten_util import ravel_pytree
    from exploring_meta_tpu.ops.cg import conjugate_gradient
    from exploring_meta_tpu.rl.trpo_meta import meta_surrogate_loss

    def local_step(params, old_params_stack, replays):
        flat0, unravel = ravel_pytree(params)

        # Local shard losses; every cross-device quantity is an explicit
        # pmean (differentiating *through* pmean under shard_map does not
        # produce the cross-device gradient reduction).
        def local_loss_kl(flat):
            return meta_surrogate_loss(policy, unravel(flat),
                                       old_params_stack, replays, cfg,
                                       adapt_steps)

        def loss_kl(flat):
            loss, kl = local_loss_kl(flat)
            return jax.lax.pmean(loss, axis), jax.lax.pmean(kl, axis)

        old_loss_l, grad_l = jax.value_and_grad(
            lambda f: local_loss_kl(f)[0])(flat0)
        old_loss = jax.lax.pmean(old_loss_l, axis)
        grad_flat = jax.lax.pmean(grad_l, axis)

        grad_kl_local = jax.grad(lambda f: local_loss_kl(f)[1])

        def Fvp(v):
            _, hv = jax.jvp(grad_kl_local, (flat0,), (v,))
            return jax.lax.pmean(hv, axis) + trpo_cfg.damping * v

        step = conjugate_gradient(Fvp, grad_flat,
                                  num_iterations=trpo_cfg.cg_iterations)
        shs = 0.5 * jnp.dot(step, Fvp(step))
        step = step / jnp.sqrt(shs / trpo_cfg.max_kl)

        def cond(state):
            i, accepted, _ = state
            return jnp.logical_and(i < trpo_cfg.ls_max_steps,
                                   jnp.logical_not(accepted))

        def body(state):
            i, _, cur = state
            size = (trpo_cfg.backtrack_factor ** i) * trpo_cfg.outer_lr
            cand = flat0 - size * step
            new_loss, kl = loss_kl(cand)
            ok = jnp.logical_and(new_loss < old_loss, kl < trpo_cfg.max_kl)
            return i + 1, ok, jnp.where(ok, cand, cur)

        _, accepted, final = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                         flat0))
        return unravel(final), {"old_loss": old_loss, "accepted": accepted}

    return local_step


def make_sharded_trpo_meta_step(policy, cfg, trpo_cfg, adapt_steps: int,
                                mesh: Mesh, axis: str = "tasks"):
    """Task-DP TRPO meta-optimization over the mesh — the distributed form
    of reference ``meta_optimize_trpo`` (rl.py:409-438); see
    :func:`_make_local_trpo_outer` for the collective structure.

    ``(params, old_params_stack, replays) -> (params, info)`` with the
    task-stacked inputs sharded on their leading axis, params replicated.
    """
    local_step = _make_local_trpo_outer(policy, cfg, trpo_cfg, adapt_steps,
                                        axis)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_trpo_train_scan(env, policy, rollout_fn, cfg, trpo_cfg,
                                 meta_batch_size: int, n_steps: int,
                                 mesh: Mesh, axis: str = "tasks"):
    """Multi-chip AND multi-iteration meta-RL fusion for device envs:
    ``n_steps`` whole MAML-TRPO iterations in ONE XLA program, with the
    task axis sharded over the mesh.

    Per iteration, each chip samples ``meta_batch / n_devices`` tasks on
    device (step key folded by mesh position so shards draw disjoint
    tasks), runs its vmapped first-order rollouts + inner adaptation, then
    the second-order CG/line-search outer step runs task-DP with ``pmean``
    over ICI (:func:`_make_local_trpo_outer`) — the sharded form of
    ``rl.make_trpo_train_scan`` and the end state of the reference's
    sequential task loop + subprocess env stepping (rl/maml_trpo.py:92-134).

    Returns ``train(params, key) -> (params, metrics)`` with metrics leaves
    stacked ``[n_steps]``; metric values are global (pmean'd) means.
    """
    from exploring_meta_tpu.rl.adapt_rl import trpo_collect_body

    n_shards = mesh.shape[axis]
    if meta_batch_size % n_shards != 0:
        raise ValueError(f"meta_batch_size={meta_batch_size} not divisible "
                         f"by mesh size {n_shards}")
    local_mb = meta_batch_size // n_shards
    local_outer = _make_local_trpo_outer(policy, cfg, trpo_cfg,
                                         cfg.adapt_steps, axis)

    collect = trpo_collect_body(policy, rollout_fn, cfg)

    def local_iteration(params, step_key):
        shard_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        k_tasks, k_adapt = jax.random.split(shard_key)
        tasks_batch = env.sample_tasks(k_tasks, local_mb)
        keys = jax.random.split(k_adapt, local_mb)
        old_params, _, replays, ms = collect(params, tasks_batch, keys)
        params, info = local_outer(params, old_params, replays)
        return params, {
            "adapt_reward": jax.lax.pmean(jnp.mean(ms["reward"]), axis),
            "adapt_success": jax.lax.pmean(jnp.mean(ms["success"]), axis),
            "meta_loss": info["old_loss"],  # already pmean'd in the outer
            "ls_accepted": info["accepted"].astype(jnp.float32),
        }

    @jax.jit
    def train(params, key):
        sharded = shard_map(
            local_iteration, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(sharded, params, keys)

    return train


def make_sharded_replay_meta_step(policy, cfg, algo: str, optimizer,
                                  mesh: Mesh, axis: str = "tasks"):
    """Task-DP Adam outer step over recorded replays (host envs): each
    chip re-derives the differentiable PPO/VPG query losses for its shard
    of the replay buffer (rl/replay_meta.py), gradients are ``pmean``-
    reduced over ICI, and every chip applies the identical optimizer
    update to its replicated params — the mesh form of the host Adam
    outer step (reference ``rl/maml_ppo.py:128-130``).

    ``(params, opt_state, stacked_replays) -> (params, opt_state, loss)``
    with replays sharded on their leading task axis.
    """
    from exploring_meta_tpu.rl.replay_meta import make_replay_meta_loss

    meta_loss = make_replay_meta_loss(algo, policy, cfg)

    def local_step(params, opt_state, replays):
        loss, grads = jax.value_and_grad(meta_loss)(params, replays)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_adam_train_scan(env, policy, rollout_fn, cfg, optimizer,
                                 algo: str, meta_batch_size: int,
                                 n_steps: int, mesh: Mesh,
                                 axis: str = "tasks"):
    """Sharded + fused PPO/VPG meta-training for device envs: the Adam
    analog of :func:`make_sharded_trpo_train_scan` (reference
    ``rl/maml_ppo.py:128-130`` — Adam through the differentiable query
    losses). Outer gradients are ``pmean``-reduced over ICI; params and
    opt-state stay replicated.

    Returns ``train(params, opt_state, key) -> (params, opt_state,
    metrics)`` with metrics leaves stacked ``[n_steps]``.
    """
    from exploring_meta_tpu.rl.adapt_rl import fast_adapt_ppo, fast_adapt_vpg

    fast_adapt = {"ppo": fast_adapt_ppo, "vpg": fast_adapt_vpg}[algo]
    n_shards = mesh.shape[axis]
    if meta_batch_size % n_shards != 0:
        raise ValueError(f"meta_batch_size={meta_batch_size} not divisible "
                         f"by mesh size {n_shards}")
    local_mb = meta_batch_size // n_shards

    def local_iteration(carry, step_key):
        params, opt_state = carry
        shard_key = jax.random.fold_in(step_key, jax.lax.axis_index(axis))
        k_tasks, k_adapt = jax.random.split(shard_key)
        tasks_batch = env.sample_tasks(k_tasks, local_mb)
        keys = jax.random.split(k_adapt, local_mb)

        def batch_loss(p):
            def task_loss(task, k):
                _, loss, m = fast_adapt(policy, p, rollout_fn, task, k, cfg)
                return loss, m
            losses, ms = jax.vmap(task_loss)(tasks_batch, keys)
            return jnp.mean(losses), ms

        (loss, ms), grads = jax.value_and_grad(batch_loss,
                                               has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {
            "meta_loss": jax.lax.pmean(loss, axis),
            "adapt_reward": jax.lax.pmean(jnp.mean(ms["reward"]), axis),
            "adapt_success": jax.lax.pmean(jnp.mean(ms["success"]), axis),
        }

    @jax.jit
    def train(params, opt_state, key):
        sharded = shard_map(
            local_iteration, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        keys = jax.random.split(key, n_steps)
        (params, opt_state), metrics = jax.lax.scan(
            sharded, (params, opt_state), keys)
        return params, opt_state, metrics

    return train
