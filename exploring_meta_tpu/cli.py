"""Console entry points (installed as ``emt-*`` commands).

One function per user-facing CLI; the repo's ``scripts/*.py`` are thin
shims over these same functions, so ``python scripts/maml_vision.py``
and an installed ``emt-maml-vision`` run identical code. The flag
surface mirrors the reference scripts (SURVEY.md §5 config row):
``vision/maml_vision.py:161-191``, ``rl/maml_trpo.py:155-185``,
``misc_scripts/eval_vision.py`` / ``eval_rl.py`` argument dicts.
"""

from __future__ import annotations

import argparse


def _vision_main(anil: bool, description: str) -> None:
    from exploring_meta_tpu.utils.config import (
        VisionConfig, anil_vision_defaults, vision_argparser,
    )
    from exploring_meta_tpu.trainers import VisionTrainer

    defaults = anil_vision_defaults() if anil else VisionConfig()
    args = vision_argparser(defaults, description).parse_args()
    cfg = VisionConfig(**vars(args))
    VisionTrainer(cfg, anil=anil).run()


def _rl_main(algo: str, anil: bool, description: str) -> None:
    from exploring_meta_tpu.utils.config import RLScriptConfig, rl_argparser
    from exploring_meta_tpu.trainers.rl import RLTrainer

    defaults = RLScriptConfig()
    args = rl_argparser(defaults, description).parse_args()
    cfg = RLScriptConfig(**vars(args))
    RLTrainer(cfg, algo=algo, anil=anil).run()


def maml_vision() -> None:
    _vision_main(False, "MAML on Vision")


def anil_vision() -> None:
    _vision_main(True, "ANIL on Vision")


def maml_trpo() -> None:
    _rl_main("trpo", False, "MAML-TRPO on Meta-RL")


def anil_trpo() -> None:
    _rl_main("trpo", True, "ANIL-TRPO on Meta-RL")


def maml_ppo() -> None:
    _rl_main("ppo", False, "MAML-PPO on Meta-RL")


def anil_ppo() -> None:
    _rl_main("ppo", True, "ANIL-PPO on Meta-RL")


def maml_vpg() -> None:
    _rl_main("vpg", False, "MAML-VPG on Meta-RL")


def anil_vpg() -> None:
    _rl_main("vpg", True, "ANIL-VPG on Meta-RL")


def eval_vision() -> None:
    """Offline vision evaluation (reference misc_scripts/eval_vision.py)."""
    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()
    p = argparse.ArgumentParser(description="Evaluate a vision run directory")
    p.add_argument("path", help="run directory (results/<algo>_<dataset>_...)")
    p.add_argument("--no_cl", action="store_true")
    p.add_argument("--no_rc", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()
    from exploring_meta_tpu.analysis import eval_vision as ev
    ev.run(args.path, run_cl=not args.no_cl, run_rc=not args.no_rc,
           synthetic=args.synthetic or None)


def eval_rl() -> None:
    """Offline RL evaluation (reference misc_scripts/eval_rl.py)."""
    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()
    p = argparse.ArgumentParser(description="Evaluate an RL run directory")
    p.add_argument("path", help="run directory")
    p.add_argument("--cl", action="store_true", help="run CL experiment")
    p.add_argument("--rc", action="store_true",
                   help="run rep-change experiment")
    p.add_argument("--n_eval_tasks", type=int, default=None)
    p.add_argument("--each3", action="store_true",
                   help="3 trials per distinct task (reference eval_rl.py:33)")
    p.add_argument("--task", type=str, default=None,
                   help="explicit ML10 task name to evaluate, e.g. "
                        "'door-close' (reference eval_params['n_tasks'] "
                        "string mode)")
    p.add_argument("--test_on_train", action="store_true",
                   help="meta-test on the benchmark's TRAIN tasks "
                        "(reference eval_rl.py:32)")
    p.add_argument("--checkpoint", type=int, default=None,
                   help="evaluate model_checkpoints/model_<N>.npz instead "
                        "of the final model (reference eval_rl.py:29)")
    p.add_argument("--workers", type=int, default=None,
                   help="host-env episode slots (defaults to "
                        "adapt_batch_size)")
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
    from exploring_meta_tpu.analysis import eval_rl as er
    er.run(args.path, run_cl=args.cl, run_rc=args.rc,
           n_eval_tasks=args.task or args.n_eval_tasks,
           each3=args.each3, test_on_train=args.test_on_train,
           checkpoint=args.checkpoint, workers=args.workers,
           task_batch=args.task_batch)


def pack_datasets() -> None:
    """One-time host-side packing of real downloads into device-ready
    arrays (see exploring_meta_tpu/tasks/pack.py)."""
    import os
    from exploring_meta_tpu.tasks.pack import pack_omniglot, pack_mini_imagenet
    p = argparse.ArgumentParser(
        description="Pack original dataset downloads into the on-device "
                    "sampler's [n_classes, n_per_class, H, W, C] arrays")
    p.add_argument("dataset", choices=["omniglot", "mini-imagenet"])
    p.add_argument("--src", required=True, help="original download dir")
    p.add_argument("--out", default=os.path.expanduser(
        "~/data/exploring_meta_tpu"))
    args = p.parse_args()
    if args.dataset == "omniglot":
        pack_omniglot(args.src, args.out)
    else:
        pack_mini_imagenet(args.src, args.out)
