#!/usr/bin/env python3
"""Random-policy baseline (reference baselines/random.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from exploring_meta_tpu.utils.config import RLScriptConfig, rl_argparser
from exploring_meta_tpu.trainers.baselines import RandomPolicyBaseline


def main():
    defaults = RLScriptConfig()
    args = rl_argparser(defaults, "Random-policy baseline (reference baselines/random.py).").parse_args()
    cfg = RLScriptConfig(**vars(args))
    RandomPolicyBaseline(cfg).run()


if __name__ == "__main__":
    main()
