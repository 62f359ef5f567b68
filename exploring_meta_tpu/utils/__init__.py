"""Experiment harness, config, and misc utilities."""

from exploring_meta_tpu.utils.experiment import (
    Experiment,
    flatten_params,
    unflatten_into,
    load_params,
    load_checkpoint,
)

__all__ = ["Experiment", "flatten_params", "unflatten_into", "load_params",
           "load_checkpoint"]
