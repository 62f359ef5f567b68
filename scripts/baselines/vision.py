#!/usr/bin/env python3
"""Supervised vision baseline (reference baselines/vision.py)."""

import os
import sys

# Replace the script dir on sys.path with the repo root: this package
# mirrors the reference's baselines/random.py name, which would shadow
# the stdlib `random` module during jax import if the dir stayed first.
sys.path[0] = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from exploring_meta_tpu.utils.config import VisionConfig, vision_argparser
from exploring_meta_tpu.trainers.baselines import VisionBaseline


def main():
    defaults = VisionConfig(outer_lr=0.001, num_iterations=100)
    args = vision_argparser(defaults, "Vision baseline").parse_args()
    cfg = VisionConfig(**vars(args))
    VisionBaseline(cfg).run()


if __name__ == "__main__":
    main()
