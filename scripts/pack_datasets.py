#!/usr/bin/env python3
"""Shim over exploring_meta_tpu.tasks.pack / cli.pack_datasets (the
installable ``emt-pack-datasets``); kept so repo-root invocation works
without installing the package."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from exploring_meta_tpu.tasks.pack import (  # noqa: F401  (test API)
    pack_mini_imagenet, pack_omniglot,
)
from exploring_meta_tpu.cli import pack_datasets as main

if __name__ == "__main__":
    main()
