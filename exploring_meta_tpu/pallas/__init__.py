"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §7.2 stage 11).

Kernels are drop-in replacements for their XLA counterparts, verified
against them in tests, and adopted only where measured faster on TPU.

Measure-first decisions on this hardware/runtime:
- GAE/discount: fused kernels win ~1000x standalone (XLA reverse scans
  execute pathologically slowly as standalone programs here), are a
  measured 1.16x end-to-end win inside the TRPO iteration (BASELINE.md
  r4s3) -> auto-dispatched by ops/gae.py, the one pallas DEFAULT.
- Policy rollouts: a fused Particles2D rollout kernel existed through
  round 4 and LOST its end-to-end A/B (25.1 vs 27.0 it/s, BASELINE.md
  r4s5 — the XLA lax.scan rollout already fuses policy-forward +
  env-step + recording; the kernel saves no HBM traffic and adds launch
  overhead). Removed in round 5; git history has the implementation.
- CNN4 conv blocks: per-block fused kernels kept OPT-IN as the stage-11
  post-mortem artifact (cnn4_pallas.py docstring) — XLA remains default.
"""

from exploring_meta_tpu.pallas.gae_pallas import gae_pallas, discount_pallas

__all__ = ["gae_pallas", "discount_pallas"]
