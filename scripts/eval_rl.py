#!/usr/bin/env python3
"""Offline RL evaluation (reference misc_scripts/eval_rl.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.analysis import eval_rl


def main():
    p = argparse.ArgumentParser(description="Evaluate an RL run directory")
    p.add_argument("path", help="run directory")
    p.add_argument("--cl", action="store_true", help="run CL experiment")
    p.add_argument("--rc", action="store_true", help="run rep-change experiment")
    p.add_argument("--n_eval_tasks", type=int, default=None)
    args = p.parse_args()
    eval_rl.run(args.path, run_cl=args.cl, run_rc=args.rc,
                n_eval_tasks=args.n_eval_tasks)


if __name__ == "__main__":
    main()
