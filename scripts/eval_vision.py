#!/usr/bin/env python3
"""Shim over exploring_meta_tpu.cli.eval_vision (the installable ``emt-eval-vision``);
kept so repo-root invocation works without installing the package."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.cli import eval_vision as main

if __name__ == "__main__":
    main()
