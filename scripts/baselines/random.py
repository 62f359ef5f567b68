#!/usr/bin/env python3
"""Random-policy baseline (reference baselines/random.py)."""

import os
import sys

# Replace the script dir on sys.path with the repo root: this package
# mirrors the reference's baselines/random.py name, which would shadow
# the stdlib `random` module during jax import if the dir stayed first.
sys.path[0] = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from exploring_meta_tpu.utils.config import RLScriptConfig, rl_argparser
from exploring_meta_tpu.trainers.baselines import RandomPolicyBaseline


def main():
    defaults = RLScriptConfig()
    args = rl_argparser(defaults, "Random-policy baseline (reference baselines/random.py).").parse_args()
    cfg = RLScriptConfig(**vars(args))
    RandomPolicyBaseline(cfg).run()


if __name__ == "__main__":
    main()
