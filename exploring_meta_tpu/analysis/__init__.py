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
from exploring_meta_tpu.analysis import eval_vision, eval_rl

__all__ = [
    "run_cl_exp", "run_cl_rl_exp", "save_acc_matrix", "run_rep_exp",
    "run_rep_rl_exp", "sanity_check", "measure_change_through_time",
    "eval_vision", "eval_rl",
]
