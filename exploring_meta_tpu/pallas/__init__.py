"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §7.2 stage 11).

Kernels are drop-in replacements for their XLA counterparts, verified
against them in tests, and adopted only where measured faster on TPU.
"""

from exploring_meta_tpu.pallas.gae_pallas import gae_pallas, discount_pallas

__all__ = ["gae_pallas", "discount_pallas"]

from exploring_meta_tpu.pallas.rollout_pallas import (
    make_fused_particles2d_rollout,
)

__all__ += ["make_fused_particles2d_rollout"]
