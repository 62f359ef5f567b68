#!/usr/bin/env python3
"""MAML on few-shot vision (CLI parity with reference vision/maml_vision.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.utils.config import VisionConfig, vision_argparser
from exploring_meta_tpu.trainers import VisionTrainer


def main():
    defaults = VisionConfig()
    args = vision_argparser(defaults, "MAML on Vision").parse_args()
    cfg = VisionConfig(**vars(args))
    VisionTrainer(cfg, anil=False).run()


if __name__ == "__main__":
    main()
