"""MAML/ANIL engine: functional inner loops + one-program meta-steps.

This replaces the reference's whole object-graph machinery —
``l2l.algorithms.MAML`` clone/adapt (``vision/maml_vision.py:104``,
``core_functions/vision.py:13``), the sequential per-task Python loop with
``.backward()`` gradient accumulation (``maml_vision.py:102-141``), and
``maml_update``/``clone_module`` (``core_functions/rl.py:374,447``) — with
three pure functions:

- ``inner_sgd``: unrolled K-step gradient descent on a params pytree.
  Second-order meta-gradients fall out of ``jax.grad`` through the unroll;
  ``first_order=True`` stop-gradients the inner grads (the l2l
  ``first_order`` flag). A ``trainable`` mask pytree freezes leaves (ANIL
  adapts only the head; l2l's ``allow_unused``/``allow_nograd`` become
  unnecessary).
- ``make_meta_loss``: support/query episode -> scalar meta-objective for
  one task.
- ``make_meta_step``: jit(grad(vmap(task_loss))) + optax update — the
  entire meta-iteration (32 tasks x inner loops x second-order backward)
  as ONE XLA program, vs. the reference's 32 sequential clone/adapt/
  backward round-trips.

The inner loop can rematerialize the per-step loss with ``jax.checkpoint``
(``inner_sgd(remat=True)``) when long unrolls exhaust HBM; it is OFF by
default — measured 2.1x slower at CNN4 scale where HBM is plentiful.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def tree_where(mask, a, b):
    """Per-leaf select: mask leaves are booleans (or 0/1)."""
    return jax.tree_util.tree_map(
        lambda m, x, y: jnp.where(m, x, y), mask, a, b)


def inner_sgd(loss_fn: Callable, params, batch, inner_lr: float,
              adapt_steps: int, first_order: bool = False,
              trainable=None, remat: bool = False):
    """K steps of SGD on ``loss_fn(params, batch)``; returns adapted params.

    Differentiable end-to-end: taking ``jax.grad`` of a function of the
    result gives exact second-order MAML meta-gradients (or first-order
    when ``first_order=True``). ``trainable`` is an optional pytree of
    bools matching ``params`` — leaves marked False are frozen (ANIL).

    ``remat=True`` rematerializes the per-step loss in the second-order
    backward — measured 2.1x SLOWER at CNN4 scale where HBM is plentiful;
    enable it only when long unrolls / big models exhaust memory.
    """
    step_loss = jax.checkpoint(loss_fn) if remat else loss_fn
    for _ in range(adapt_steps):
        grads = jax.grad(step_loss)(params, batch)
        if first_order:
            grads = jax.lax.stop_gradient(grads)
        if trainable is not None:
            grads = tree_where(trainable, grads,
                               jax.tree_util.tree_map(jnp.zeros_like, grads))
        params = jax.tree_util.tree_map(
            lambda p, g: p - inner_lr * g, params, grads)
    return params


class TaskResult(NamedTuple):
    loss: jnp.ndarray
    metric: jnp.ndarray  # accuracy (vision) or reward (RL)


def make_fast_adapt(loss_and_metric: Callable, inner_lr: float,
                    adapt_steps: int, first_order: bool = False,
                    trainable=None):
    """Build the per-task ``fast_adapt`` (reference
    ``core_functions/vision.py:6-18``): adapt on support, evaluate on query.

    ``loss_and_metric(params, batch) -> (loss, metric)``. Returns
    ``fast_adapt(params, support, query) -> TaskResult`` where
    ``TaskResult.loss`` is the *differentiable* query loss.
    """
    support_loss = lambda p, b: loss_and_metric(p, b)[0]

    def fast_adapt(params, support, query) -> TaskResult:
        adapted = inner_sgd(support_loss, params, support, inner_lr,
                            adapt_steps, first_order=first_order,
                            trainable=trainable)
        loss, metric = loss_and_metric(adapted, query)
        return TaskResult(loss=loss, metric=metric)

    return fast_adapt


def cast_compute(fast_adapt: Callable, dtype=jnp.bfloat16):
    """Mixed-precision wrapper: run the ENTIRE per-task compute graph
    (inner loops + second-order backward) in ``dtype`` while params and
    optimizer state stay f32 master copies.

    The cast happens INSIDE the differentiated function, so AD transposes
    it automatically and meta-gradients arrive f32 at the optimizer. This
    targets the measured bottleneck: the CNN4 meta-step is HBM-bandwidth-
    bound (BASELINE.md roofline note), and bf16 activations halve the
    bytes — measured 1.44x on the Omniglot headline config, meta-test
    accuracy parity-gated via ``scripts/parity_check.py --bf16``.

    The returned TaskResult is cast back to f32 for stable metric
    accumulation.
    """

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            tree)

    def fa(params, *batch):
        res = fast_adapt(cast(params), *cast(batch))
        return res._replace(
            loss=res.loss.astype(jnp.float32),
            metric=res.metric.astype(jnp.float32))

    return fa


def make_meta_step(fast_adapt: Callable, optimizer: optax.GradientTransformation):
    """Build the jitted outer step.

    ``fast_adapt(params, *task) -> TaskResult`` is vmapped over the leading
    task axis of every remaining argument; the mean query loss (the
    reference's grad-accumulate + ``p.grad.mul_(1/B)``,
    ``vision/maml_vision.py:139-141``) is differentiated through everything
    and the optimizer applied. Returns
    ``meta_step(params, opt_state, *task_batch) ->
    (new_params, new_opt_state, metrics_dict)``.
    """

    def batch_loss(params, *task_batch):
        results = jax.vmap(lambda *t: fast_adapt(params, *t))(*task_batch)
        return jnp.mean(results.loss), jnp.mean(results.metric)

    @jax.jit
    def meta_step(params, opt_state, *task_batch):
        (loss, metric), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, *task_batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "metric": metric}

    return meta_step


def make_train_scan(fast_adapt: Callable,
                    optimizer: optax.GradientTransformation,
                    sample_fn: Callable, n_steps: int,
                    eval_sample_fn: Callable | None = None):
    """Fuse ``n_steps`` whole meta-iterations into ONE XLA program.

    The reference pays a full Python round-trip per task per iteration.
    With the episodic sampler already on device, a ``lax.scan`` over
    iterations removes the host from the loop entirely: sample -> vmap'd
    inner loops -> meta-grad -> optimizer, times ``n_steps``, one dispatch
    (measured +15% over the one-program-per-iteration ``make_meta_step``
    at CNN4/Omniglot scale on one v5e chip — device compute, not dispatch,
    dominates there; the fused path also hides tunnel latency entirely).

    ``sample_fn(key, *data) -> task_batch`` — pass the dataset arrays
    through ``*data`` rather than closing over them: closed-over arrays
    are folded into the HLO as constants, which bloats compilation
    (megabytes of dataset shipped to the compiler).

    ``eval_sample_fn(key, *data) -> task_batch``, if given, additionally
    runs a no-update meta-eval on each step's POST-update params (the
    reference's per-iteration valid-task pass,
    ``vision/maml_vision.py:117-124``), adding ``valid_loss`` /
    ``valid_metric`` to the metrics.

    Returns ``train(params, opt_state, key, *data) -> (params, opt_state,
    metrics)`` with metrics leaves stacked ``[n_steps]``.
    """

    def batch_eval(params, task_batch):
        results = jax.vmap(lambda *t: fast_adapt(params, *t))(*task_batch)
        return jnp.mean(results.loss), jnp.mean(results.metric)

    @jax.jit
    def train(params, opt_state, key, *data):
        def one_step(carry, step_key):
            params, opt_state = carry
            if eval_sample_fn is None:
                k_tr = step_key
            else:
                k_tr, k_va = jax.random.split(step_key)
            task_batch = sample_fn(k_tr, *data)
            (loss, metric), grads = jax.value_and_grad(
                batch_eval, has_aux=True)(params, task_batch)
            out = {"loss": loss, "metric": metric}
            if eval_sample_fn is not None:
                # PRE-update params: the reference's valid pass runs
                # before opt.step() (vision/maml_vision.py:117-141)
                v_loss, v_metric = batch_eval(
                    params, eval_sample_fn(k_va, *data))
                out["valid_loss"], out["valid_metric"] = v_loss, v_metric
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), out

        keys = jax.random.split(key, n_steps)
        (params, opt_state), metrics = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, metrics

    return train


def make_meta_eval(fast_adapt: Callable):
    """Jitted meta-evaluation over a task batch (no outer update) —
    reference ``core_functions/vision.py:26-42``."""

    @jax.jit
    def meta_eval(params, *task_batch):
        results = jax.vmap(lambda *t: fast_adapt(params, *t))(*task_batch)
        return {"loss": jnp.mean(results.loss),
                "metric": jnp.mean(results.metric)}

    return meta_eval


