#!/usr/bin/env python3
"""XLA cost-analysis roofline reporter for the headline programs.

Makes BASELINE.md's roofline methodology a reproducible tool: compile the
selected program, read XLA's ``cost_analysis()`` (FLOPs + bytes accessed),
and report arithmetic intensity against the chip's ridge point. With
``--time`` it also ground-truth-times the program on the current backend
(host fetch inside the window — ``block_until_ready`` does not synchronize
on this runtime) and reports achieved TFLOP/s / GB/s vs peak.

Caveats (same as BASELINE.md):
- "bytes accessed" counts fusion-served accesses, so achieved GB/s can
  exceed DRAM peak when on-chip reuse is high;
- a ``lax.scan``/``while_loop`` body is counted ONCE, not x trips — for
  fused/TRPO programs divide by trip count before comparing to wall-clock
  (the tool reports per-compiled-program numbers and, where the trip
  count is static, per-iteration ones).

Usage:
    python scripts/roofline.py --config maml_omni [--bf16] [--conv_impl s2d]
    python scripts/roofline.py --config anil_min --time
    python scripts/roofline.py --config maml_min --bf16 --time --mem
    python scripts/roofline.py --config trpo_particles --fuse 10 --time
    EMT_FORCE_CPU=1 python scripts/roofline.py --config maml_omni   # no chip
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# v5e peaks; override for other chips.
PEAK_TFLOPS_BF16 = float(os.environ.get("EMT_PEAK_TFLOPS", 197.0))
PEAK_HBM_GBS = float(os.environ.get("EMT_PEAK_HBM_GBS", 819.0))

WAYS, ADAPT_STEPS = 5, 1

# (dataset, anil, shots) per vision config — shots follow the reference
# budgets: MAML-min is the 5w1s config (vision/maml_vision.py), the
# ANIL/omni headliners are 5w5s. "trpo_particles" is the RL flagship
# (reference rl/maml_trpo.py scale), built separately below.
VISION_CONFIGS = {
    "maml_omni": ("omni", False, 5),
    "anil_min": ("min", True, 5),
    "maml_min": ("min", False, 1),
}
CONFIGS = dict(VISION_CONFIGS, trpo_particles=None)


def build_vision(config: str, bf16: bool, meta_batch: int,
                 remat_body: bool = False, precision: str = ""):
    import jax
    import optax
    from exploring_meta_tpu import adapt, models, tasks
    from exploring_meta_tpu.models.layers import set_precision

    dataset, anil, shots = VISION_CONFIGS[config]
    if precision:
        set_precision(precision)
    elif bf16:
        set_precision("default")
    if dataset == "min":
        ds, _, _ = tasks.load_mini_imagenet(seed=0, synthetic=True)
        spec = (models.anil_mini_imagenet_spec(ways=WAYS) if anil
                else models.mini_imagenet_spec(ways=WAYS))
    else:
        ds, _, _ = tasks.load_omniglot(seed=0, synthetic=True,
                                       synthetic_classes=1623)
        spec = models.omniglot_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr=0.5,
                                      adapt_steps=ADAPT_STEPS,
                                      shots=shots, ways=WAYS, anil=anil,
                                      remat_body=remat_body)
    if bf16:
        fa = adapt.cast_compute(fa)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = adapt.make_meta_step(fa, opt)
    data, labels = tasks.sample_task_batch(jax.random.key(1), ds, WAYS,
                                           shots, meta_batch)
    args = (params, opt_state, data, labels)
    fetch = lambda out: float(out[2]["loss"])
    # vision: one meta-iteration per program; cost analysis covers it fully
    return step, args, fetch, 1, meta_batch, False


def build_trpo(bf16: bool, fuse: int, precision: str = "",
               tasks_per_iter: int = 20):
    """The RL flagship: full MAML-TRPO meta-iterations at reference scale
    (rl/maml_trpo.py: 20 tasks x 20 episodes x horizon 100, first-order
    collection + second-order CG/line-search outer step), ``fuse``
    iterations per program via the trainers' fused path
    (rl/train_scan.py). XLA cost_analysis counts the scan body ONCE, so
    the reported FLOPs/bytes are per-ITERATION while the program runs
    ``fuse`` of them — the caller must scale (body_counted_once=True)."""
    import jax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy
    from exploring_meta_tpu.models.layers import set_precision

    # Only an EXPLICIT --precision overrides here (unlike build_vision's
    # bf16 auto-"default"): the recorded r5s6b TRPO rows ran under the
    # module default, and the RL bf16 mode casts operands itself
    # (compute_dtype), where the MXU precision knob is a measured no-op.
    if precision:
        set_precision(precision)
    TASKS = tasks_per_iter
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    if bf16:
        policy = policy._replace(compute_dtype="bf16")
    params = policy.init(jax.random.key(0))
    rl_cfg = rl.RLConfig(inner_lr=0.05, gamma=0.99, tau=1.0, adapt_steps=1,
                         adapt_batch_size=20, max_path_length=100)
    trpo_cfg = rl.TRPOConfig(outer_lr=1.0, max_kl=0.01, ls_max_steps=15,
                             backtrack_factor=0.5)
    roll = rl.make_rollout(env, policy.sample, episodes=20, horizon=100)
    train = rl.make_trpo_train_scan(env, policy, roll, rl_cfg, trpo_cfg,
                                    TASKS, fuse)
    args = (params, jax.random.key(1))
    fetch = lambda out: float(out[1]["meta_loss"][-1])
    return train, args, fetch, fuse, TASKS, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=sorted(CONFIGS),
                   default="maml_omni")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--conv_impl", choices=["direct", "s2d", "pallas"],
                   default="direct")
    p.add_argument("--meta_batch", type=int, default=None,
                   help="tasks per meta-iteration (default: 32 for the "
                        "vision configs, 20 — the rl/maml_trpo.py "
                        "reference scale — for trpo_particles)")
    p.add_argument("--fuse", type=int, default=10,
                   help="trpo_particles: meta-iterations per fused program "
                        "(the trainers' --fuse K)")
    p.add_argument("--precision", choices=["highest", "default"], default="",
                   help="override the MXU precision (default: highest for "
                        "f32 runs, default/single-pass-bf16 for --bf16)")
    p.add_argument("--remat_body", action="store_true",
                   help="ANIL: checkpoint body conv blocks "
                        "(FLOPs-for-bytes A/B; see adapt/vision.py)")
    p.add_argument("--time", action="store_true",
                   help="also ground-truth-time the program (10 steps)")
    p.add_argument("--mem", action="store_true",
                   help="report XLA memory_analysis (physical/padded buffer "
                        "sizes) next to the logical cost-analysis bytes")
    args = p.parse_args()

    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    from exploring_meta_tpu.models.layers import set_conv_impl
    set_conv_impl(args.conv_impl)

    if args.config == "trpo_particles":
        mb = args.meta_batch if args.meta_batch is not None else 20
        step, call_args, fetch, iters_per_program, tasks_per_iter, \
            body_once = build_trpo(bf16=args.bf16, fuse=args.fuse,
                                   precision=args.precision,
                                   tasks_per_iter=mb)
    else:
        mb = args.meta_batch if args.meta_batch is not None else 32
        step, call_args, fetch, iters_per_program, tasks_per_iter, \
            body_once = build_vision(
                config=args.config, bf16=args.bf16,
                meta_batch=mb, remat_body=args.remat_body,
                precision=args.precision)

    lowered = step.lower(*call_args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byts = float(ca.get("bytes accessed", float("nan")))
    # XLA counts a lax.scan body ONCE; for fused programs the reported
    # costs are per-iteration and the program runs iters_per_program trips.
    if body_once:
        flops_iter, byts_iter = flops, byts
        flops_prog = flops * iters_per_program
        byts_prog = byts * iters_per_program
        prog_note = f" (~scan body x {iters_per_program}, prologue excl.)"
    else:
        flops_iter = flops / iters_per_program
        byts_iter = byts / iters_per_program
        flops_prog, byts_prog, prog_note = flops, byts, ""
    intensity = flops_iter / byts_iter if byts_iter else float("nan")
    ridge = PEAK_TFLOPS_BF16 * 1e12 / (PEAK_HBM_GBS * 1e9)
    print(f"config={args.config} bf16={args.bf16} conv_impl={args.conv_impl} "
          f"meta_batch={tasks_per_iter} backend={jax.default_backend()}")
    print(f"per program:   {flops_prog/1e9:.2f} GFLOP, "
          f"{byts_prog/1e9:.3f} GB accessed{prog_note}")
    print(f"per iteration: {flops_iter/1e9:.2f} GFLOP, "
          f"{byts_iter/1e9:.3f} GB "
          f"({tasks_per_iter} tasks)")
    print(f"arithmetic intensity: {intensity:.1f} FLOP/byte "
          f"(MXU ridge ~{ridge:.0f} -> "
          f"{'bandwidth' if intensity < ridge else 'compute'}-bound regime)")
    bound_ms = max(flops_iter / (PEAK_TFLOPS_BF16 * 1e12),
                   byts_iter / (PEAK_HBM_GBS * 1e9)) * 1e3
    print(f"roofline bound: {bound_ms:.2f} ms/iteration at v5e peaks "
          f"({PEAK_TFLOPS_BF16:.0f} TF/s bf16, {PEAK_HBM_GBS:.0f} GB/s)")

    if args.mem:
        # Physical (padded, tiled) buffer sizes from the compiler, vs the
        # logical bytes above. TPU tiles arrays to (8,128)/f32, (16,128)/bf16
        # — small trailing dims (e.g. 3-channel RGB, 32-channel conv stacks)
        # inflate the real HBM traffic well past the logical byte count, so a
        # "78% of HBM peak (logical)" row can be the hardware running at the
        # wall. ``memory_analysis`` reports allocation, not traffic, but the
        # arg/output/temp split bounds the padding multiplier on each stream.
        ma = compiled.memory_analysis()
        if ma is None:
            print("memory_analysis: unavailable on this backend")
        else:
            def _get(name):
                v = getattr(ma, name, None)
                return f"{v/1e9:.3f} GB" if isinstance(v, (int, float)) else "?"
            print(f"memory_analysis (physical): args={_get('argument_size_in_bytes')} "
                  f"out={_get('output_size_in_bytes')} "
                  f"temp={_get('temp_size_in_bytes')} "
                  f"peak={_get('peak_memory_in_bytes')}")
            logical_args = sum(x.size * x.dtype.itemsize
                               for x in jax.tree_util.tree_leaves(call_args)
                               if hasattr(x, "dtype"))
            phys = getattr(ma, "argument_size_in_bytes", None)
            if isinstance(phys, (int, float)) and logical_args:
                print(f"argument padding multiplier: {phys/logical_args:.2f}x "
                      f"(physical {phys/1e9:.3f} GB / logical "
                      f"{logical_args/1e9:.3f} GB)")
                if byts_prog:
                    # The argument stream is usually a sliver of the
                    # program's traffic (temps dominate) — bound what a
                    # perfect tile-aligned argument layout could win
                    # before celebrating the multiplier above.
                    print(f"argument share of logical traffic: "
                          f"{100*logical_args/byts_prog:.2f}% "
                          f"(padding waste "
                          f"{100*(phys-logical_args)/byts_prog:.2f}% "
                          f"of logical bytes = ceiling on any arg-layout win)")
            temp = getattr(ma, "temp_size_in_bytes", None)
            peak = getattr(ma, "peak_memory_in_bytes", None)
            if isinstance(temp, (int, float)) and byts_prog:
                # temp_size is ALLOCATION (live-range peak), not traffic,
                # but temps are the dominant stream in these programs; the
                # alloc/logical-traffic ratio tracks how much physical
                # tile padding the temp stream carries across metabatch
                # (a flat measured/bound ratio with flat temp/logical is
                # padding, not a fixed overhead).
                print(f"temp stream: physical alloc {temp/1e9:.3f} GB = "
                      f"{temp/byts_prog:.3f}x logical traffic/program"
                      + (f", {100*temp/peak:.0f}% of peak alloc"
                         if isinstance(peak, (int, float)) and peak else ""))

    if args.time:
        out = step(*call_args)
        fetch(out)  # compile + settle
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(*call_args)
        fetch(out)  # ground-truth: host fetch depends on the last step
        dt = (time.perf_counter() - t0) / n
        dt_iter = dt / iters_per_program
        print(f"measured: {dt*1e3:.2f} ms/program = "
              f"{dt_iter*1e3:.2f} ms/iteration -> "
              f"{flops_prog/dt/1e12:.2f} TFLOP/s "
              f"({100*flops_prog/dt/1e12/PEAK_TFLOPS_BF16:.1f}% MXU peak), "
              f"{byts_prog/dt/1e9:.0f} GB/s logical "
              f"({100*byts_prog/dt/1e9/PEAK_HBM_GBS:.0f}% HBM peak), "
              f"{tasks_per_iter/dt_iter:.0f} tasks/sec, "
              f"{1/dt_iter:.1f} it/s")


if __name__ == "__main__":
    main()
