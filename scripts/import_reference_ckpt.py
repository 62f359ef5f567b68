#!/usr/bin/env python
"""Import a reference-trained run dir (torch state_dict checkpoints) into
a framework run dir consumable by scripts/eval_vision.py, eval_rl.py and
serving.

Reference artifact layout (utils/experiment.py:85-90 + the per-trainer
save calls; split files per rl/anil_trpo.py:131-134 /
vision/anil_vision.py:154-164):

    <run>/logger.json                      config (flag names shared)
    <run>/model.pt                         MAML vision / RL policy
    <run>/features.pt + head.pt            ANIL vision
    <run>/body.pt + head.pt                ANIL RL
    <run>/model_checkpoints/model_<i>.pt   (+ _features_/_head_/_body_)

Usage:
    python scripts/import_reference_ckpt.py <reference_run_dir> <out_dir> \
        [--kind {maml_vision,anil_vision,maml_rl,anil_rl}]

The kind is auto-detected from logger.json when omitted. See
utils/import_torch.py for every layout translation (NCHW->NHWC conv
weights, flatten-order head permutation, MAML-wrapper key stripping,
ANIL sigma-reset semantics) and MIGRATION.md for the recipe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="reference run dir (holds logger.json + .pt)")
    p.add_argument("dst", help="output framework run dir")
    p.add_argument("--kind", default=None,
                   choices=["maml_vision", "anil_vision", "maml_rl",
                            "anil_rl"])
    args = p.parse_args()

    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()
    from exploring_meta_tpu.utils.import_torch import import_reference_run
    import_reference_run(args.src, args.dst, kind=args.kind)


if __name__ == "__main__":
    main()
