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

from functools import partial
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
    n = n_devices or len(devs)
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
    n_shards = mesh.shape[axis]

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


def shard_task_batch(mesh: Mesh, task_batch, axis: str = "tasks"):
    """Place a host task batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), task_batch)
