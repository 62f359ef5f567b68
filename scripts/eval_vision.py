#!/usr/bin/env python3
"""Offline vision evaluation (reference misc_scripts/eval_vision.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.analysis import eval_vision


def main():
    p = argparse.ArgumentParser(description="Evaluate a vision run directory")
    p.add_argument("path", help="run directory (results/<algo>_<dataset>_...)")
    p.add_argument("--no_cl", action="store_true")
    p.add_argument("--no_rc", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()
    eval_vision.run(args.path, run_cl=not args.no_cl, run_rc=not args.no_rc,
                    synthetic=args.synthetic or None)


if __name__ == "__main__":
    main()
