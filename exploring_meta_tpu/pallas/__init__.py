"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §7.2 stage 11).

Kernels are drop-in replacements for their XLA counterparts, verified
against them in tests, and adopted only where measured faster on TPU.

Measure-first decisions on this hardware/runtime:
- GAE/discount: fused kernels win ~1000x standalone (XLA reverse scans
  execute pathologically slowly as standalone programs here) and are
  neutral inside larger programs -> auto-dispatched by ops/gae.py.
- Policy rollouts: fused kernel wins standalone (one launch vs scan) and
  is opt-in inside training programs (in-program scans are fine; the
  kernel serializes per-task weights that XLA parallelizes).
- CNN4 conv blocks: left to XLA — in-program convs batch all tasks onto
  the MXU already and show no standalone-scan pathology; a hand conv
  kernel would duplicate XLA's strength rather than fix a weakness.
"""

from exploring_meta_tpu.pallas.gae_pallas import gae_pallas, discount_pallas

__all__ = ["gae_pallas", "discount_pallas"]

from exploring_meta_tpu.pallas.rollout_pallas import (
    make_fused_particles2d_rollout,
)

__all__ += ["make_fused_particles2d_rollout"]
