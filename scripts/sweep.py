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

``--vmap_seeds`` collapses the sweep to ONE XLA program: all seeds train
simultaneously via ``vmap`` over the fused train scans
(parallel/multiseed.py) — the TPU-native end state of the reference's
one-process-per-seed workflow. Available for the vision algos and the
device-env RL algos; with ``--mesh N`` the SEED axis shards over the
mesh (independent seeds, zero collectives). Differences from the serial
path, by construction: seeds share one dataset instance (sampled with
the base ``--seed``), run dirs hold metrics + final model only (no
checkpoint cadence / resume), and the post-training meta-test draws
from a fresh fold of each seed's key stream.
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


def _seed_run_dirs(sweep_dir, algo, seeds, metrics_per_seed, params_stack,
                   finals, final_key, trainer_algo, dataset, base_cfg):
    """Write one run dir per seed (metrics.json + logger.json in the
    Experiment contract + final model.npz) so every downstream tool —
    the band plotter, ``scripts/eval_{vision,rl}.py``, the servers'
    ``from_checkpoint`` — works on vmapped sweeps unchanged.
    ``trainer_algo``/``dataset`` are the names the real trainer would
    stamp (eval scripts parse algo prefixes and the dataset field)."""
    import numpy as np

    import jax
    from exploring_meta_tpu.utils.experiment import flatten_params

    import datetime

    # Unique per-invocation parent (the serial path gets uniqueness from
    # Experiment's run-dir naming): a re-run with different flags must
    # not clobber artifacts an earlier summary json still points at.
    stamp = datetime.datetime.now().strftime("%d_%m_%Hh%M%S")
    runs = []
    for i, seed in enumerate(seeds):
        d = os.path.join(sweep_dir, f"vmap_{algo}_{stamp}", f"seed{seed}")
        os.makedirs(d, exist_ok=True)
        ms = {k: [float(v) for v in np.asarray(vals[i])]
              for k, vals in metrics_per_seed.items()}
        ms[final_key] = [finals[i]]
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump(ms, f)
        config = {**base_cfg.to_params(), "algo": trainer_algo,
                  "dataset": dataset, "seed": seed}
        with open(os.path.join(d, "logger.json"), "w") as f:
            json.dump({"config": config, "vmapped_sweep": True,
                       final_key: finals[i]}, f, indent=4, default=str)
        p_i = jax.tree.map(lambda x: np.asarray(x[i]), params_stack)
        np.savez(os.path.join(d, "model.npz"), **flatten_params(p_i))
        runs.append({"seed": seed, "run_dir": d, final_key: finals[i]})
    return runs


def _chunk_sizes(cfg):
    """--fuse as iterations-per-program for the vmapped sweeps: a whole
    reference budget (5k iterations x S seeds) as ONE dispatch is minutes
    of device time in a single RPC, which this image's remote runtime
    kills mid-execution ("TPU worker process crashed", observed twice at
    the full-scale Omniglot budget, chip_logs/r5s1{,b}). Chunked driving
    keeps each dispatch short; fuse<=1 (the sweep default) keeps the
    whole budget in one program for budgets that fit."""
    if cfg.num_iterations < 1:
        raise SystemExit("--vmap_seeds needs --num_iterations >= 1")
    chunk = cfg.fuse if cfg.fuse > 1 else cfg.num_iterations
    n_chunks, rem = divmod(cfg.num_iterations, chunk)
    return [chunk] * n_chunks + ([rem] if rem else [])


def _drive_chunks(make_train, sizes, keys, state, extra=()):
    """Drive the chunk schedule through per-size vmapped programs.

    Splits each seed's key once per chunk (even in the single-chunk
    case — task-sampling streams therefore differ from pre-r5 sweep
    artifacts at the same --seeds; streams stay self-consistent and
    distinct per seed, which is all a sweep needs). Each program is
    called as ``train(*state, key, *extra)`` and must return
    ``(*state', metrics)``; metrics concatenate along the iteration
    axis (leaves are [S, n]). -> (state, keys, metrics)."""
    import jax
    import jax.numpy as jnp

    trains = {n: make_train(n) for n in set(sizes)}
    split_keys = jax.vmap(lambda k: jax.random.split(k))
    state, chunk_ms = tuple(state), []
    for n in sizes:
        ks = split_keys(keys)
        keys, use = ks[:, 0], ks[:, 1]
        out = trains[n](*state, use, *extra)
        state, ms = out[:-1], out[-1]
        chunk_ms.append(ms)
    ms = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *chunk_ms) \
        if len(chunk_ms) > 1 else chunk_ms[0]
    return state, keys, ms


def _vmapped_vision(cfg, anil, seeds, mesh):
    """All-seeds-in-one-program vision sweep. -> (metrics dict with
    leaves [S, num_iterations], params_stack, per-seed test accs)."""
    import jax
    import optax

    from exploring_meta_tpu import adapt, models, parallel, tasks
    from exploring_meta_tpu.models.layers import set_conv_impl
    from exploring_meta_tpu.trainers.vision import _build_spec

    train_ds, valid_ds, test_ds = tasks.get_dataset(
        cfg.dataset, seed=cfg.seed, synthetic=cfg.synthetic or None,
        synth_classes=cfg.synth_classes,
        synth_per_class=cfg.synth_per_class)
    set_conv_impl(cfg.conv_impl)
    spec = _build_spec(cfg, anil)
    fast_adapt = adapt.make_vision_fast_adapt(
        spec, inner_lr=cfg.inner_lr, adapt_steps=cfg.adapt_steps,
        shots=cfg.shots, ways=cfg.ways, anil=anil)
    if cfg.bf16:
        fast_adapt = adapt.cast_compute(fast_adapt)
    opt = optax.adam(cfg.outer_lr)
    mb = cfg.meta_batch_size

    def sample_train(k, tr_imgs, va_imgs):
        return tasks.sample_task_batch(
            k, train_ds._replace(images=tr_imgs), cfg.ways, cfg.shots, mb)

    def sample_valid(k, tr_imgs, va_imgs):
        return tasks.sample_task_batch(
            k, valid_ds._replace(images=va_imgs), cfg.ways, cfg.shots, mb)

    params, opt_state, keys = parallel.stack_seed_states(
        lambda ik: models.init_cnn4(ik, spec), seeds, opt)

    def make_train(n):
        return parallel.vmap_seeds(
            adapt.make_train_scan(fast_adapt, opt, sample_train, n,
                                  eval_sample_fn=sample_valid),
            3, 2, mesh=mesh)

    (params, opt_state), keys, ms = _drive_chunks(
        make_train, _chunk_sizes(cfg), keys, (params, opt_state),
        extra=(train_ds.images, valid_ds.images))

    # Per-seed meta-test on the test split, one vmapped program (fresh
    # fold of each seed's carry key — the scan consumed the key itself).
    meta_eval = adapt.make_meta_eval(fast_adapt)
    test_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x7e57))(keys)
    t_batch = jax.vmap(lambda k: tasks.sample_task_batch(
        k, test_ds, cfg.ways, cfg.shots, mb))(test_keys)
    test_m = jax.vmap(lambda p, d, l: meta_eval(p, d, l))(params, *t_batch)
    finals = [float(v) for v in test_m["metric"]]
    metrics = {"train_loss": ms["loss"], "train_acc": ms["metric"],
               "valid_loss": ms["valid_loss"],
               "valid_acc": ms["valid_metric"]}
    return metrics, params, finals


def _vmapped_rl(cfg, algo, anil, seeds, mesh):
    """All-seeds-in-one-program device-env RL sweep. -> (metrics
    [S, num_iterations], params_stack, per-seed eval rewards)."""
    import jax
    import optax

    from exploring_meta_tpu import parallel, rl
    from exploring_meta_tpu.trainers.rl import build_policy, make_device_env

    try:
        env = make_device_env(cfg.env)
    except ValueError as e:
        raise SystemExit(f"--vmap_seeds: {e}")
    policy = build_policy(env, anil, fc_neurons=cfg.fc_neurons,
                          activation=cfg.activation)
    if cfg.bf16:
        policy = policy._replace(compute_dtype="bf16")
    rl_cfg = rl.RLConfig(
        inner_lr=cfg.inner_lr, gamma=cfg.gamma, tau=cfg.tau,
        adapt_steps=cfg.adapt_steps, adapt_batch_size=cfg.adapt_batch_size,
        max_path_length=cfg.max_path_length, ppo_epochs=cfg.ppo_epochs,
        ppo_clip_ratio=cfg.ppo_clip_ratio, anil=anil)
    roll = rl.make_rollout(env, policy.sample, episodes=cfg.adapt_batch_size,
                           horizon=cfg.max_path_length)
    # --fuse chunks the budget exactly as in _vmapped_vision
    # (_chunk_sizes / _drive_chunks — the r5s1 remote-worker-crash rule).
    sizes = _chunk_sizes(cfg)
    if algo == "trpo":
        trpo_cfg = rl.TRPOConfig(outer_lr=cfg.outer_lr, max_kl=cfg.max_kl,
                                 ls_max_steps=cfg.ls_max_steps,
                                 backtrack_factor=cfg.backtrack_factor)

        def make_train(n):
            t = rl.make_trpo_train_scan(env, policy, roll, rl_cfg, trpo_cfg,
                                        cfg.meta_batch_size, n)
            return parallel.vmap_seeds(t, 2, mesh=mesh)

        params, _, keys = parallel.stack_seed_states(policy.init, seeds)
        (params,), keys, ms = _drive_chunks(make_train, sizes, keys,
                                            (params,))
    else:
        opt = optax.adam(cfg.outer_lr)

        def make_train(n):
            t = rl.make_adam_train_scan(env, policy, roll, rl_cfg, opt,
                                        algo, cfg.meta_batch_size, n)
            return parallel.vmap_seeds(t, 3, mesh=mesh)

        params, opt_state, keys = parallel.stack_seed_states(
            policy.init, seeds, opt)
        (params, opt_state), keys, ms = _drive_chunks(
            make_train, sizes, keys, (params, opt_state))

    # Post-training meta-test per seed (rl.meta_test drives a fresh
    # test-split env from the host — cheap next to training).
    finals = []
    for i, seed in enumerate(seeds):
        p_i = jax.tree.map(lambda x: x[i], params)
        ek = jax.random.fold_in(keys[i], 0x7e57)
        final = rl.meta_test(algo, cfg.env, policy, p_i, rl_cfg,
                             n_tasks=cfg.n_eval_tasks, key=ek, seed=seed)
        finals.append(float(final["mean_reward"]))
    return dict(ms), params, finals


def run_vmapped(algo, base_cfg, seeds, sweep_dir, final_key):
    """One-XLA-program sweep dispatch. -> runs list (sweep.py contract)."""
    from exploring_meta_tpu import parallel

    # Serial-only trainer flags the one-program path cannot honor: fail
    # loudly rather than silently retrain from scratch / skip the trace.
    for flag in ("resume", "profile", "trace"):
        if getattr(base_cfg, flag, None):
            raise SystemExit(
                f"--vmap_seeds cannot honor --{flag}: the whole sweep is "
                f"one XLA program with no per-seed trainer loop — run the "
                f"serial sweep (drop --vmap_seeds) instead")

    mesh = (parallel.make_task_mesh(base_cfg.mesh, axis="seeds")
            if getattr(base_cfg, "mesh", 1) > 1 else None)
    prefix = "anil" if algo.startswith("anil") else "maml"
    if algo in ("maml_vision", "anil_vision"):
        metrics, params, finals = _vmapped_vision(
            base_cfg, algo.startswith("anil"), seeds, mesh)
        trainer_algo = f"{prefix}_{base_cfg.ways}w{base_cfg.shots}s"
        dataset = base_cfg.dataset
    else:
        metrics, params, finals = _vmapped_rl(
            base_cfg, algo.split("_")[1], algo.startswith("anil"), seeds,
            mesh)
        trainer_algo, dataset = algo, base_cfg.env
    for seed, final in zip(seeds, finals):
        print(f"seed {seed}: {final_key} = {final:.4f}")
    return _seed_run_dirs(sweep_dir, algo, seeds, metrics, params, finals,
                          final_key, trainer_algo, dataset, base_cfg)


def _run_serial(make_trainer, base_cfg, seeds, final_key):
    """N sequential trainer runs in one process (compiled programs are
    reused across seeds — seeds change data, not shapes)."""
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
    return runs


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
    p.add_argument("--vmap_seeds", action="store_true",
                   help="train ALL seeds in one vmapped XLA program "
                        "(vision + device-env RL; --mesh N shards the "
                        "seed axis)")
    args = p.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    if not seeds:
        raise SystemExit(f"--seeds {args.seeds!r}: no seeds given")
    trainer_fields = {k: v for k, v in vars(args).items()
                      if k not in ("seeds", "metric", "sweep_dir",
                                   "vmap_seeds")}
    base_cfg = cfg_cls(**trainer_fields)

    if args.vmap_seeds:
        runs = run_vmapped(algo, base_cfg, seeds, args.sweep_dir, final_key)
    else:
        runs = _run_serial(make_trainer, base_cfg, seeds, final_key)

    os.makedirs(args.sweep_dir, exist_ok=True)
    tag = f"{algo}_{'-'.join(str(s) for s in seeds)}"
    finals = [r[final_key] for r in runs]
    n = len(finals)
    mean = sum(finals) / n
    std = (sum((f - mean) ** 2 for f in finals) / max(n - 1, 1)) ** 0.5
    summary = {"algo": algo, "metric": final_key, "seeds": seeds,
               "runs": runs, "mean": mean, "std": std,
               "vmapped": bool(args.vmap_seeds),
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
