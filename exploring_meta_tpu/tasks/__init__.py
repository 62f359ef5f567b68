"""Episodic data layer: packed datasets + on-device task sampling."""

from exploring_meta_tpu.tasks.datasets import (
    PackedDataset,
    load_omniglot,
    load_mini_imagenet,
    get_dataset,
)
from exploring_meta_tpu.tasks.sampler import (
    sample_task,
    sample_task_batch,
    split_support_query,
)

__all__ = [
    "PackedDataset", "load_omniglot", "load_mini_imagenet", "get_dataset",
    "sample_task", "sample_task_batch", "split_support_query",
]
