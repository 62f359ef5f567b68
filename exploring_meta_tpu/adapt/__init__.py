"""MAML/ANIL adaptation engine."""

from exploring_meta_tpu.adapt.maml import (
    cast_compute,
    inner_sgd,
    make_fast_adapt,
    make_meta_step,
    make_train_scan,
    make_meta_eval,
    tree_where,
    TaskResult,
)
from exploring_meta_tpu.adapt.vision import make_vision_fast_adapt

__all__ = [
    "cast_compute", "inner_sgd", "make_fast_adapt", "make_meta_step", "make_train_scan",
    "make_meta_eval",
    "tree_where", "TaskResult", "make_vision_fast_adapt",
]
