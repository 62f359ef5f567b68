"""Production serving for meta-trained models.

The reference has no serving path — deployment there means re-running the
offline eval scripts (``misc_scripts/eval_vision.py`` /
``eval_rl.py:29-45``) one task at a time. On TPU the natural serving unit
is a single fused XLA program per request batch: inner-adapt on the
request's support set and predict its queries in ONE dispatch, ``vmap``-ed
over concurrent requests, optionally GSPMD-sharded over a device mesh for
multi-chip serving. Inference-time adaptation takes no meta-gradient, so
the programs are first-order by construction and cheap.

- :class:`VisionServer` — few-shot classification:
  ``(support_x, support_y, query_x) -> (predictions, probabilities)``
  with the same inner-SGD semantics the model was meta-trained with
  (reference ``core_functions/vision.py:6-18``; ANIL head-only inner
  updates as in ``vision/anil_vision.py:86-99``).
- :class:`PolicyServer` — meta-RL: adapt a policy from a collected
  support :class:`~exploring_meta_tpu.rl.rollout.Trajectory` (vpg / ppo /
  trpo inner updates, the reference's analysis-side semantics,
  ``misc_scripts/cl_rl.py:70-87``) and expose jitted stochastic /
  deterministic action fns for deployment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exploring_meta_tpu.adapt.maml import inner_sgd
from exploring_meta_tpu.models.cnn4 import (
    CNN4Spec, cnn4_apply, cnn4_features, cnn4_head_apply, init_cnn4,
)
from exploring_meta_tpu.ops.losses import cross_entropy
from exploring_meta_tpu.rl.adapt_rl import RLConfig, single_adapt_step


def _cast_tree(tree, dtype):
    cast = lambda x: (x.astype(dtype)
                      if jnp.issubdtype(x.dtype, jnp.floating) else x)
    return jax.tree_util.tree_map(cast, tree)


def _next_bucket(B: int, multiple: int = 1) -> int:
    """Next power-of-two bucket >= B, rounded up to a multiple of
    ``multiple`` (device counts need not be powers of two — e.g. a
    6-device mesh; doubling alone would never reach divisibility by a
    non-power-of-two and must not be the only growth rule).

    Each distinct batch shape compiles a fresh XLA program — 20s to
    minutes through the remote compile service — so variable serving
    concurrency must land on a small, fixed set of shapes."""
    b = 1
    while b < B:
        b *= 2
    if b % multiple:
        b = -(-b // multiple) * multiple
    return b


def _pad_leading(tree, pad: int):
    """Pad every leaf's leading axis by repeating its first slice."""
    tile = lambda x: jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
    return jax.tree_util.tree_map(tile, tree)


class VisionServer:
    """Few-shot classification serving on a meta-trained CNN4.

    One request = ``(support_x [S,H,W,C], support_y [S], query_x [Q,H,W,C])``
    with S = shots*ways labeled examples of the new classes. ``__call__``
    serves one request; :meth:`batch` serves B concurrent requests as one
    vmapped XLA program — and shards them over ``mesh`` when given (GSPMD
    partitions the request axis; params replicate).

    ``compute_dtype=jnp.bfloat16`` runs adaptation + prediction in bf16
    (the meta-step measurements in BASELINE.md show these models are
    HBM-bandwidth-bound, so halved activation bytes ≈ halved latency);
    predictions come back as f32 probabilities either way.
    """

    def __init__(self, spec: CNN4Spec, params, *, inner_lr: float,
                 adapt_steps: int, anil: bool = False,
                 compute_dtype=None, mesh: Mesh | None = None):
        self.spec = spec
        self.params = params
        self.mesh = mesh
        if mesh is not None:
            # Params never change between requests — replicate them onto
            # the mesh ONCE, not per batch() call on the hot path.
            self._mesh_params = jax.device_put(
                params, NamedSharding(mesh, P()))

        def adapt_predict(p, sx, sy, qx):
            if compute_dtype is not None:
                p = _cast_tree(p, compute_dtype)
                sx = sx.astype(compute_dtype)
                qx = qx.astype(compute_dtype)
            if anil:
                # Batch-stat BN parity with meta-training: the body
                # encodes support+query jointly (adapt/vision.py
                # fast_adapt_anil), then only the head adapts.
                feats = cnn4_features(p, spec, jnp.concatenate([sx, qx]))
                f_s, f_q = feats[: sx.shape[0]], feats[sx.shape[0]:]

                def head_loss(head, batch):
                    f, y = batch
                    return cross_entropy(cnn4_head_apply({"head": head}, f),
                                         y)

                head = inner_sgd(head_loss, p["head"], (f_s, sy), inner_lr,
                                 adapt_steps, first_order=True)
                logits = cnn4_head_apply({"head": head}, f_q)
            else:
                def loss(pp, batch):
                    x, y = batch
                    return cross_entropy(cnn4_apply(pp, spec, x), y)

                adapted = inner_sgd(loss, p, (sx, sy), inner_lr,
                                    adapt_steps, first_order=True)
                logits = cnn4_apply(adapted, spec, qx)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        self._one = jax.jit(adapt_predict)
        self._batched = jax.jit(jax.vmap(adapt_predict,
                                         in_axes=(None, 0, 0, 0)))

    @classmethod
    def from_checkpoint(cls, path: str, spec: CNN4Spec, **kwargs):
        """Load ``model.npz`` / a checkpoint written by the trainers
        (utils/experiment.py contract) and serve it."""
        from exploring_meta_tpu.utils.experiment import load_params
        template = init_cnn4(jax.random.key(0), spec)
        return cls(spec, load_params(path, template), **kwargs)

    def __call__(self, support_x, support_y, query_x):
        """Serve one request -> ``(predicted_labels [Q], probs [Q, ways])``."""
        return self._one(self.params, support_x, support_y, query_x)

    _bucket = staticmethod(_next_bucket)

    def batch(self, support_x, support_y, query_x):
        """Serve B concurrent requests (leading axis) as one program.

        Batches are padded (repeating the first request) up to the next
        power-of-two bucket — so any concurrency level hits one of
        log2(max_batch) compiled programs instead of compiling per size —
        and the padding is sliced off the results. With a mesh, requests
        are additionally committed sharded over its first axis with
        params replicated, so the one jitted program partitions over all
        mesh devices (per-request work is independent — zero collectives
        in the serving path); buckets are then also device-count
        multiples.
        """
        B = support_x.shape[0]
        bucket = self._bucket(B, self.mesh.size if self.mesh else 1)
        pad = bucket - B
        if pad:
            support_x, support_y, query_x = _pad_leading(
                (support_x, support_y, query_x), pad)
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            support_x, support_y, query_x = (
                jax.device_put(support_x, shard),
                jax.device_put(support_y, shard),
                jax.device_put(query_x, shard))
            params = self._mesh_params
        else:
            params = self.params
        preds, probs = self._batched(params, support_x, support_y, query_x)
        return (preds[:B], probs[:B]) if pad else (preds, probs)


class PolicyServer:
    """Meta-RL serving: adapt a meta-trained policy to a new task from a
    collected support trajectory, then act.

    ``adapt`` consumes a ``Trajectory`` (from any rollout path — device
    scan, host vec env, or logged data) and returns adapted params via
    the same first-order inner update the analysis tier uses
    (rl/adapt_rl.py ``single_adapt_step``; reference cl_rl.py:70-87).
    ``sample`` / ``act`` are jitted per-step fns for the serving loop —
    ``act`` is the deterministic mean action (production control),
    ``sample`` the stochastic one (matches training-time behavior).
    """

    def __init__(self, policy, params, cfg: RLConfig, algo: str = "vpg",
                 mesh: Mesh | None = None):
        if algo not in ("vpg", "ppo", "trpo"):
            raise ValueError(f"unknown adaptation algorithm {algo!r}")
        self.policy = policy
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # Meta-params never change between requests — replicate them
            # onto the mesh ONCE, off the hot path.
            self._mesh_params = jax.device_put(
                params, NamedSharding(mesh, P()))
        self._adapt = jax.jit(
            lambda p, traj: single_adapt_step(algo, policy, p, traj, cfg))
        # stacked params in, stacked params out — iterable for multi-step
        self._adapt_stacked = jax.jit(jax.vmap(
            lambda p, traj: single_adapt_step(algo, policy, p, traj, cfg)))
        self._sample = jax.jit(policy.sample)
        if hasattr(policy, "density"):          # Gaussian policies: mean
            det = lambda p, s: policy.density(p, s)[0]
        else:                                   # Categorical: argmax logits
            det = lambda p, s: jnp.argmax(policy.logits(p, s), axis=-1)
        self._act = jax.jit(det)
        # Fleet-serving action fns: one program for n tasks' adapted
        # params acting on their own observation batches.
        self._act_stacked = jax.jit(jax.vmap(det))
        self._sample_stacked = jax.jit(jax.vmap(policy.sample))

    @classmethod
    def from_checkpoint(cls, path: str, policy, cfg: RLConfig, **kwargs):
        """Load ``model.npz`` / a checkpoint written by the RL trainers
        (utils/experiment.py contract) and serve it; ``policy`` is the
        spec the checkpoint was trained with."""
        from exploring_meta_tpu.utils.experiment import load_params
        template = policy.init(jax.random.key(0))
        return cls(policy, load_params(path, template), cfg, **kwargs)

    def adapt(self, support, steps: int | None = None):
        """-> adapted params after ``steps`` (default ``cfg.adapt_steps``;
        ``steps=0`` returns the meta-params unchanged) inner updates on
        the support trajectory."""
        params = self.params
        for _ in range(self.cfg.adapt_steps if steps is None else steps):
            params = self._adapt(params, support)
        return params

    def adapt_batched(self, support_stack, steps: int | None = None):
        """Adapt to ``n`` tasks at once: ``support_stack`` has a leading
        task axis; -> params stack with the same leading axis. Applies
        the same ``steps`` budget as :meth:`adapt`.

        Requests are padded (repeating the first task) up to the next
        power-of-two bucket so any concurrency level hits one of
        log2(max_batch) compiled programs; the padding is sliced off.
        With a ``mesh``, the task axis is additionally GSPMD-sharded over
        its first axis with meta-params replicated (per-task adaptation
        is independent — zero collectives on the serving path), and
        buckets are device-count multiples."""
        n = jax.tree_util.tree_leaves(support_stack)[0].shape[0]
        bucket = _next_bucket(n, self.mesh.size if self.mesh else 1)
        pad = bucket - n
        if pad:
            support_stack = _pad_leading(support_stack, pad)
        base = self._mesh_params if self.mesh is not None else self.params
        params = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (bucket,) + x.shape), base)
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            support_stack = jax.device_put(support_stack, shard)
            params = jax.device_put(params, shard)
        for _ in range(self.cfg.adapt_steps if steps is None else steps):
            params = self._adapt_stacked(params, support_stack)
        if pad:
            params = jax.tree_util.tree_map(lambda x: x[:n], params)
        return params

    def sample(self, params, key, obs):
        return self._sample(params, key, obs)

    def act(self, params, obs):
        return self._act(params, obs)

    def _fleet_call(self, fn, params_stack, *rest):
        """Shared bucket/shard wrapper for the per-step fleet programs:
        the control step is the serving hot path, so it gets the same
        bounded compile-shape set and mesh partitioning as adaptation."""
        n = jax.tree_util.tree_leaves(params_stack)[0].shape[0]
        bucket = _next_bucket(n, self.mesh.size if self.mesh else 1)
        pad = bucket - n
        if pad:
            params_stack = _pad_leading(params_stack, pad)
            rest = tuple(_pad_leading(r, pad) for r in rest)
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            params_stack = jax.device_put(params_stack, shard)
            rest = tuple(jax.device_put(r, shard) for r in rest)
        out = fn(params_stack, *rest)
        if pad:  # tree_map: Categorical sample returns an (action, info)
            out = jax.tree_util.tree_map(lambda x: x[:n], out)  # pytree
        return out

    def act_batched(self, params_stack, obs_stack):
        """Deterministic actions for ``n`` tasks' adapted params on their
        own ``[n, E, obs]`` observation batches — ONE program for the
        whole served fleet's control step (bucketed, and mesh-sharded
        over the request axis when the server has a mesh)."""
        return self._fleet_call(self._act_stacked, params_stack, obs_stack)

    def sample_batched(self, params_stack, keys, obs_stack):
        """Stochastic :meth:`act_batched` (training-time behavior);
        ``keys`` has the task leading axis."""
        return self._fleet_call(self._sample_stacked, params_stack, keys,
                                obs_stack)
