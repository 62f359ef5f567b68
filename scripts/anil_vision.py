#!/usr/bin/env python3
"""ANIL on few-shot vision (CLI parity with reference vision/anil_vision.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.utils.config import (
    VisionConfig, anil_vision_defaults, vision_argparser,
)
from exploring_meta_tpu.trainers import VisionTrainer


def main():
    defaults = anil_vision_defaults()
    args = vision_argparser(defaults, "ANIL on Vision").parse_args()
    cfg = VisionConfig(**vars(args))
    VisionTrainer(cfg, anil=True).run()


if __name__ == "__main__":
    main()
