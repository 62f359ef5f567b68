#!/usr/bin/env python3
"""ANIL-VPG meta-RL (CLI parity with reference rl/anil_vpg.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.utils.config import RLScriptConfig, rl_argparser
from exploring_meta_tpu.trainers.rl import RLTrainer


def main():
    defaults = RLScriptConfig()
    args = rl_argparser(defaults, "ANIL-VPG on Meta-RL").parse_args()
    cfg = RLScriptConfig(**vars(args))
    RLTrainer(cfg, algo="vpg", anil=True).run()


if __name__ == "__main__":
    main()
