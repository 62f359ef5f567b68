#!/usr/bin/env python3
"""Multi-seed sweep driver: run one config across seeds, aggregate, plot.

The reference's multi-seed workflow is manual — run each seed by hand,
then feed the run dirs to ``misc_scripts/plot_stuff.py``. This drives it
end to end: N seeded runs of any trainer (in ONE process, so every seed
after the first reuses the compiled XLA programs — seeds change data,
not shapes), a Student-t confidence-band plot over the per-iteration
curves (``utils.plotter.plot_runs_with_confidence``), and a
``sweep_summary.json`` with per-seed finals and the aggregate mean/CI.

Usage:
    python scripts/sweep.py maml_vision --seeds 42,7,123 \
        [any maml_vision flags: --synthetic --num_iterations 100 ...]
    python scripts/sweep.py maml_trpo --seeds 42,7 --metric adapt_reward \
        [any RL trainer flags]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dataclasses import replace

from exploring_meta_tpu.utils.config import (
    RLScriptConfig, VisionConfig, rl_argparser, vision_argparser,
)

# algo -> (config cls, argparser builder, trainer factory, final-metric key,
#          default curve metric for the confidence band)
def _algos():
    from exploring_meta_tpu.trainers import VisionTrainer
    from exploring_meta_tpu.trainers.rl import RLTrainer

    from exploring_meta_tpu.utils.config import anil_vision_defaults

    def vision(anil):
        # per-algo script defaults, not the bare dataclass: an anil sweep
        # must launch what N runs of scripts/anil_vision.py would
        defaults = anil_vision_defaults if anil else VisionConfig
        return (VisionConfig,
                lambda d: vision_argparser(d, "sweep"),
                lambda cfg: VisionTrainer(cfg, anil=anil),
                "test_acc", "valid_acc", defaults)

    def rl(algo, anil):
        return (RLScriptConfig,
                lambda d: rl_argparser(d, "sweep"),
                lambda cfg: RLTrainer(cfg, algo=algo, anil=anil),
                "eval_reward", "adapt_reward", RLScriptConfig)

    table = {"maml_vision": vision(False), "anil_vision": vision(True)}
    for a in ("trpo", "ppo", "vpg"):
        table[f"maml_{a}"] = rl(a, False)
        table[f"anil_{a}"] = rl(a, True)
    return table


def main():
    if len(sys.argv) < 2 or sys.argv[1].startswith("-"):
        raise SystemExit(
            "usage: sweep.py <algo> --seeds 42,7,... [trainer flags]\n"
            f"algos: {', '.join(sorted(_algos()))}")
    algo, argv = sys.argv[1], sys.argv[2:]
    table = _algos()
    if algo not in table:
        raise SystemExit(f"unknown algo {algo!r}; one of {sorted(table)}")
    (cfg_cls, build_parser, make_trainer, final_key, curve_default,
     default_cfg) = table[algo]

    p = build_parser(default_cfg())
    p.add_argument("--seeds", type=str, default="42,7,123",
                   help="comma-separated seeds to sweep")
    p.add_argument("--metric", type=str, default=curve_default,
                   help="per-iteration metric for the confidence band")
    p.add_argument("--sweep_dir", type=str, default="sweeps",
                   help="where the summary + plot land")
    args = p.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    if not seeds:
        raise SystemExit(f"--seeds {args.seeds!r}: no seeds given")
    trainer_fields = {k: v for k, v in vars(args).items()
                      if k not in ("seeds", "metric", "sweep_dir")}
    base_cfg = cfg_cls(**trainer_fields)

    runs = []
    for seed in seeds:
        print(f"=== sweep seed {seed} ===")
        trainer = make_trainer(replace(base_cfg, seed=seed))
        result = trainer.run()
        final = (float(result) if not isinstance(result, dict)
                 else float(result.get("mean_reward",
                                       next(iter(result.values())))))
        runs.append({"seed": seed, "run_dir": trainer.model_path,
                     final_key: final})
        print(f"seed {seed}: {final_key} = {final:.4f}")

    os.makedirs(args.sweep_dir, exist_ok=True)
    tag = f"{algo}_{'-'.join(str(s) for s in seeds)}"
    finals = [r[final_key] for r in runs]
    n = len(finals)
    mean = sum(finals) / n
    std = (sum((f - mean) ** 2 for f in finals) / max(n - 1, 1)) ** 0.5
    summary = {"algo": algo, "metric": final_key, "seeds": seeds,
               "runs": runs, "mean": mean, "std": std,
               "config": base_cfg.to_params()}

    # Write the aggregate FIRST — the training results must survive any
    # plotting failure (they cost N full runs to produce).
    out = os.path.join(args.sweep_dir, f"{tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)

    from exploring_meta_tpu.utils import plotter
    try:
        band = plotter.plot_runs_with_confidence(
            [r["run_dir"] for r in runs], metric=args.metric,
            save_path=os.path.join(args.sweep_dir, f"{tag}.png"))
        summary["band_metric"] = args.metric
        summary["band_final_mean"] = band["mean"][-1] if band["mean"] else None
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
    except Exception as e:  # plot is best-effort; the json already landed
        print(f"(no band plot for metric {args.metric!r}: {e})")
    print(f"{algo}: {final_key} mean {mean:.4f} +- {std:.4f} over "
          f"{n} seeds -> {out}")


if __name__ == "__main__":
    main()
