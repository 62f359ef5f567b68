"""On-device N-way/K-shot episodic task sampler.

TPU-native replacement for the l2l task-transform chain the reference
builds in ``utils/data_pre.py:28-65`` (FilterLabels -> NWays -> KShots ->
LoadData -> RemapLabels -> ConsecutiveLabels -> RandomClassRotation): one
jitted gather program per meta-batch instead of per-sample host-side PIL
work.

A task is: ``ways`` classes sampled without replacement from the split,
``2*shots`` samples per class without replacement, labels remapped to
0..ways-1 in class-major order, optional per-class rotation by a random
multiple of 90 degrees. The batch is emitted as
``[meta_batch, ways*2*shots, H, W, C]`` float images (normalized to
[0,1], inverted for Omniglot) ready for a ``vmap``'d ``fast_adapt``.

Support/query splitting preserves the reference's even/odd interleave
contract (``utils/data_pre.py:122-124``): after class-major layout the
support set is every even index, so each class contributes ``shots``
support and ``shots`` query samples.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exploring_meta_tpu.tasks.datasets import PackedDataset


def _choice_no_replace(key, n: int, k: int) -> jnp.ndarray:
    """k indices from [0, n) without replacement (argsort-of-uniform).

    Deliberately NOT ``jax.random.choice(replace=False)``: that API is
    also permutation-based (same cost, same uniformity — argsort of iid
    uniforms is an unbiased random permutation), but swapping would change
    every seeded draw and so every recorded training trajectory; the
    explicit form also keeps the sampler's RNG consumption obvious (one
    uniform vector per call)."""
    return jnp.argsort(jax.random.uniform(key, (n,)))[:k]


def _rot90_times(k: jnp.ndarray, imgs: jnp.ndarray) -> jnp.ndarray:
    """Rotate a stack [S, H, W, C] by k*90 degrees (square images).

    Computes all four rotations (cheap layout ops) and selects by ``k``
    instead of ``lax.switch`` — branchless, so it vectorizes cleanly under
    the double vmap (tasks x classes); switch lowered to a dramatically
    slower form on TPU here.
    """
    variants = jnp.stack([
        imgs,
        jnp.rot90(imgs, 1, axes=(1, 2)),
        jnp.rot90(imgs, 2, axes=(1, 2)),
        jnp.rot90(imgs, 3, axes=(1, 2)),
    ])  # [4, S, H, W, C]
    return jnp.take(variants, k, axis=0)


def sample_task(key, images: jnp.ndarray, ways: int, shots: int,
                invert: bool, rotations: bool):
    """Sample one episodic task from ``images`` [n_cls, n_per, H, W, C].

    Returns ``(data [ways*2*shots, H, W, C] float32, labels [ways*2*shots])``
    in class-major order.
    """
    n_cls, n_per = images.shape[0], images.shape[1]
    assert n_cls >= ways, (
        f"dataset split has {n_cls} classes < ways={ways}")
    assert n_per >= 2 * shots, (
        f"dataset has {n_per} samples/class < 2*shots={2 * shots}")
    k_cls, k_smp, k_rot = jax.random.split(key, 3)

    cls_ids = _choice_no_replace(k_cls, n_cls, ways)                       # [ways]
    smp_keys = jax.random.split(k_smp, ways)
    smp_ids = jax.vmap(lambda k: _choice_no_replace(k, n_per, 2 * shots))(smp_keys)

    data = images[cls_ids[:, None], smp_ids]                               # [ways, 2s, H, W, C]
    data = data.astype(jnp.float32) / 255.0
    if invert:
        data = 1.0 - data
    if rotations:
        rots = jax.random.randint(k_rot, (ways,), 0, 4)
        data = jax.vmap(_rot90_times)(rots, data)

    data = data.reshape((ways * 2 * shots,) + data.shape[2:])
    labels = jnp.repeat(jnp.arange(ways), 2 * shots)
    return data, labels


@partial(jax.jit, static_argnames=("ways", "shots", "meta_batch", "invert",
                                   "rotations"))
def _sample_batch(key, images, ways, shots, meta_batch, invert, rotations):
    keys = jax.random.split(key, meta_batch)
    return jax.vmap(
        lambda k: sample_task(k, images, ways, shots, invert, rotations)
    )(keys)


def sample_task_batch(key, dataset: PackedDataset, ways: int, shots: int,
                      meta_batch: int):
    """Sample a meta-batch of tasks: ``(data [B, ways*2*shots, H, W, C],
    labels [B, ways*2*shots])`` — one XLA program, stays on device."""
    return _sample_batch(key, dataset.images, ways, shots, meta_batch,
                         dataset.invert, dataset.rotations)


def split_support_query(data: jnp.ndarray, labels: jnp.ndarray,
                        shots: int, ways: int):
    """Even/odd interleave split (reference ``prepare_batch``,
    ``utils/data_pre.py:115-129``). Works on a single task
    ([N, ...]) — under ``vmap`` for a batch."""
    idx = jnp.arange(shots * ways) * 2
    support = (jnp.take(data, idx, axis=0), jnp.take(labels, idx, axis=0))
    qidx = jnp.arange(shots * ways) * 2 + 1
    query = (jnp.take(data, qidx, axis=0), jnp.take(labels, qidx, axis=0))
    return support, query
