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
    p.add_argument("--each3", action="store_true",
                   help="3 trials per distinct task (reference eval_rl.py:33)")
    p.add_argument("--task", type=str, default=None,
                   help="explicit ML10 task name to evaluate, e.g. 'door-close' "
                        "(reference eval_params['n_tasks'] string mode)")
    p.add_argument("--test_on_train", action="store_true",
                   help="meta-test on the benchmark's TRAIN tasks "
                        "(reference eval_rl.py:32)")
    p.add_argument("--checkpoint", type=int, default=None,
                   help="evaluate model_checkpoints/model_<N>.npz instead of "
                        "the final model (reference eval_rl.py:29)")
    p.add_argument("--workers", type=int, default=None,
                   help="host-env episode slots (defaults to adapt_batch_size)")
    p.add_argument("--task_batch", action="store_true",
                   help="host envs: adapt+evaluate all tasks in lockstep "
                        "through one n_tasks*episodes vec env")
    p.add_argument("--host_policy", choices=["device", "cpu"],
                   default="device",
                   help="host envs: where per-step policy forwards run "
                        "during collection (see trainers --host_policy)")
    args = p.parse_args()
    if args.host_policy != "device":
        from exploring_meta_tpu.envs.host import set_host_policy_device
        set_host_policy_device(args.host_policy)
    eval_rl.run(args.path, run_cl=args.cl, run_rc=args.rc,
                n_eval_tasks=args.task or args.n_eval_tasks,
                each3=args.each3, test_on_train=args.test_on_train,
                checkpoint=args.checkpoint, workers=args.workers,
                task_batch=args.task_batch)


if __name__ == "__main__":
    main()
