"""Few-shot vision fast-adapt: MAML and ANIL on CNN4 backbones.

Functional equivalent of reference ``core_functions/vision.py`` +
the ANIL feature/head split of ``vision/anil_vision.py:86-99``.

Each task arrives as ``(data [2*shots*ways, H, W, C], labels)`` in
class-major order; the support/query interleave contract of
``utils/data_pre.py:115-129`` is applied inside (even indices = support).

ANIL parity details preserved:
- features are computed over the FULL task batch (support+query jointly)
  before splitting, matching ``prepare_batch(features=...)`` — so BN
  statistics in the body see support and query together;
- the inner loop adapts only the head on those features, but the feature
  graph is kept, so second-order meta-gradients flow into the body
  through the inner head update exactly as in torch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from exploring_meta_tpu.adapt.maml import (
    TaskResult, inner_sgd, make_fast_adapt,
)
from exploring_meta_tpu.models.cnn4 import (
    CNN4Spec, cnn4_apply, cnn4_features, cnn4_head_apply,
)
from exploring_meta_tpu.ops.losses import accuracy, cross_entropy
from exploring_meta_tpu.tasks.sampler import split_support_query

# the even/odd interleave contract lives in ONE place (tasks/sampler.py)
_interleave_split = split_support_query


def make_vision_fast_adapt(spec: CNN4Spec, inner_lr: float, adapt_steps: int,
                           shots: int, ways: int, anil: bool = False,
                           first_order: bool = False,
                           remat_body: bool = False) -> Callable:
    """-> ``fast_adapt(params, data, labels) -> TaskResult`` for one task.

    ``remat_body`` (ANIL only): checkpoint each body conv block so the
    meta-gradient's body backward recomputes block internals instead of
    re-reading them from HBM — a FLOPs-for-bytes trade aimed at the
    bandwidth-bound ANIL-min step (see models/cnn4.py:base_apply)."""

    if not anil:
        def loss_and_metric(params, batch):
            x, y = batch
            logits = cnn4_apply(params, spec, x)
            return cross_entropy(logits, y), accuracy(logits, y)

        adapt_eval = make_fast_adapt(loss_and_metric, inner_lr, adapt_steps,
                                     first_order=first_order)

        def fast_adapt(params, data, labels) -> TaskResult:
            support, query = _interleave_split(data, labels, shots, ways)
            return adapt_eval(params, support, query)

        return fast_adapt

    def fast_adapt_anil(params, data, labels) -> TaskResult:
        # Encode the whole task batch once with the (inner-frozen) body.
        feats = cnn4_features(params, spec, data, remat=remat_body)
        (f_s, y_s), (f_q, y_q) = _interleave_split(feats, labels, shots, ways)

        def head_loss(head, batch):
            f, y = batch
            return cross_entropy(cnn4_head_apply({"head": head}, f), y)

        head = inner_sgd(head_loss, params["head"], (f_s, y_s), inner_lr,
                         adapt_steps, first_order=first_order)
        logits = cnn4_head_apply({"head": head}, f_q)
        return TaskResult(loss=cross_entropy(logits, y_q),
                          metric=accuracy(logits, y_q))

    return fast_adapt_anil
