"""Analysis suite: CL matrices, representation-change probes, offline eval."""

from exploring_meta_tpu.analysis.cl import (
    run_cl_exp,
    run_cl_rl_exp,
    save_acc_matrix,
)
from exploring_meta_tpu.analysis.rc import (
    run_rep_exp,
    run_rep_rl_exp,
    sanity_check,
    measure_change_through_time,
)

def __getattr__(name):
    # The eval drivers pull matplotlib + trainers + env factories at
    # import time; load them only when actually asked for.
    if name in ("eval_vision", "eval_rl"):
        import importlib
        return importlib.import_module(f"exploring_meta_tpu.analysis.{name}")
    raise AttributeError(name)


__all__ = [
    "run_cl_exp", "run_cl_rl_exp", "save_acc_matrix", "run_rep_exp",
    "run_rep_rl_exp", "sanity_check", "measure_change_through_time",
    "eval_vision", "eval_rl",
]
