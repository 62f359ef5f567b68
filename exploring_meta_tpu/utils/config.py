"""Config/flag system with the reference's CLI surface.

Every trainer preserves the reference flag names (SURVEY.md §5 config
row): ``--dataset --ways --shots --outer_lr --inner_lr --adapt_steps
--meta_batch_size --adapt_batch_size --num_iterations --save_every
--seed --env`` (each script exposes the subset its reference counterpart
does, plus TPU-specific extras like ``--synthetic`` and ``--mesh``).
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, asdict


def force_cpu_if_requested() -> None:
    """``EMT_FORCE_CPU=1`` routes the run to the in-process CPU backend —
    debug/smoke runs off-TPU. The axon sitecustomize pre-imports jax, but
    the backend is not initialized until first use, so flipping the
    platform here still takes effect (same trick as tests/conftest.py).
    Called by every argparser builder, i.e. automatically by all CLI
    scripts before any jax computation."""
    if os.environ.get("EMT_FORCE_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")


@dataclass
class VisionConfig:
    """Defaults = reference ``vision/maml_vision.py:15-25``."""
    dataset: str = "omni"
    ways: int = 5
    shots: int = 1
    outer_lr: float = 0.003
    inner_lr: float = 0.5
    adapt_steps: int = 1
    meta_batch_size: int = 32
    num_iterations: int = 5000
    save_every: int = 1000
    seed: int = 42
    # TPU-native extras
    synthetic: bool = False      # force synthetic data (hermetic envs)
    synth_classes: int = 0       # synthetic dataset class count (0 = small
                                 # hermetic default; 1623 = real Omniglot shape)
    synth_per_class: int = 0     # synthetic samples/class (0 = default;
                                 # 20 omni / 600 min = real shape)
    mesh: int = 1                # devices for task-DP sharding
    use_wandb: bool = False
    resume: str = ""             # checkpoint .npz to resume from (new capability)
    profile: bool = False        # per-phase timing -> phase_times.json
    trace: str = ""              # jax.profiler trace dir (TensorBoard/XProf)
    fuse: int = 1                # iterations fused per XLA program (lax.scan)
    async_ckpt: bool = False     # checkpoint writes on a background thread
    bf16: bool = False           # bf16 compute graph, f32 master params
    remat_body: bool = False     # ANIL: checkpoint body conv blocks
                                 # (FLOPs-for-bytes; see adapt/vision.py)
    conv_impl: str = "direct"    # stride-2 conv lowering: "direct" | "s2d"
                                 # | "pallas" (per-block fused kernels)
    nan_guard: bool = True       # stop + save when train loss goes non-finite
    ckpt_backend: str = "npz"    # "npz" | "orbax" (utils/orbax_ckpt.py)
    compile_cache: str = ""      # persistent XLA compile cache dir
                                 # ("" = default location, "off" disables)

    def to_params(self) -> dict:
        return asdict(self)


def anil_vision_defaults() -> VisionConfig:
    """ANIL-vision script defaults (reference ``vision/anil_vision.py``:
    outer_lr 0.001, inner_lr 0.1) — shared by scripts/anil_vision.py and
    the sweep driver so both launch identical configurations."""
    return VisionConfig(outer_lr=0.001, inner_lr=0.1)


def vision_argparser(defaults: VisionConfig,
                     description: str) -> argparse.ArgumentParser:
    force_cpu_if_requested()
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", type=str, default=defaults.dataset,
                   help="Pick a dataset (omni | min)")
    p.add_argument("--ways", type=int, default=defaults.ways,
                   help="N-ways (classes)")
    p.add_argument("--shots", type=int, default=defaults.shots,
                   help="K-shots (samples per class)")
    p.add_argument("--outer_lr", type=float, default=defaults.outer_lr,
                   help="Outer lr")
    p.add_argument("--inner_lr", type=float, default=defaults.inner_lr,
                   help="Inner lr")
    p.add_argument("--adapt_steps", type=int, default=defaults.adapt_steps,
                   help="Adaptation steps in inner loop")
    p.add_argument("--meta_batch_size", type=int,
                   default=defaults.meta_batch_size, help="Batch size")
    p.add_argument("--num_iterations", type=int,
                   default=defaults.num_iterations, help="Number of epochs")
    p.add_argument("--save_every", type=int, default=defaults.save_every,
                   help="Interval to save model")
    p.add_argument("--seed", type=int, default=defaults.seed, help="Seed")
    p.add_argument("--synthetic", action="store_true",
                   default=defaults.synthetic,
                   help="Use synthetic data (no downloads)")
    p.add_argument("--synth_classes", type=int, default=defaults.synth_classes,
                   help="synthetic dataset class count (0 = small hermetic "
                        "default; 1623 = real FullOmniglot shape)")
    p.add_argument("--synth_per_class", type=int,
                   default=defaults.synth_per_class,
                   help="synthetic samples per class (0 = default; real "
                        "shape is 20 for omni, 600 for min)")
    p.add_argument("--mesh", type=int, default=defaults.mesh,
                   help="Devices for task-DP sharding")
    p.add_argument("--wandb", dest="use_wandb", action="store_true",
                   default=defaults.use_wandb)
    p.add_argument("--resume", type=str, default=defaults.resume,
                   help="checkpoint .npz to resume training from")
    p.add_argument("--profile", action="store_true", default=defaults.profile,
                   help="record per-phase device times -> phase_times.json")
    p.add_argument("--trace", type=str, default=defaults.trace,
                   help="capture a jax.profiler device trace of the "
                        "training loop into this directory "
                        "(TensorBoard/XProf)")
    p.add_argument("--fuse", type=int, default=defaults.fuse,
                   help="meta-iterations fused into one XLA program "
                        "(composes with --mesh; checkpoints land on chunk "
                        "ends)")
    p.add_argument("--async_ckpt", action="store_true",
                   default=defaults.async_ckpt,
                   help="write checkpoints on a background thread (training "
                        "keeps dispatching while the npz drains)")
    p.add_argument("--ckpt_backend", choices=["npz", "orbax"],
                   default=defaults.ckpt_backend,
                   help="checkpoint format: npz files (default) or an "
                        "orbax CheckpointManager (per-shard async writes; "
                        "resume with --resume <run>/model_checkpoints)")
    p.add_argument("--bf16", action="store_true", default=defaults.bf16,
                   help="mixed precision: bf16 compute graph with f32 "
                        "master params/optimizer (~1.4x on TPU; accuracy "
                        "parity-gated, see scripts/parity_check.py --bf16)")
    p.add_argument("--compile_cache", type=str, default=defaults.compile_cache,
                   help="persistent XLA compilation cache directory "
                        "(default ~/.cache/exploring_meta_tpu/xla; "
                        "'off' disables) — re-runs skip recompilation")
    p.add_argument("--remat_body", action="store_true",
                   default=defaults.remat_body,
                   help="ANIL: rematerialize body conv blocks in the "
                        "meta-gradient backward (trade FLOPs for HBM "
                        "bytes on the bandwidth-bound ANIL-min step)")
    p.add_argument("--conv_impl", choices=["direct", "s2d", "pallas"],
                   default=defaults.conv_impl,
                   help="stride-2 conv lowering: direct conv, the exact "
                        "space-to-depth reformulation (2x2 conv over 4x "
                        "channels — MXU-friendlier for the small CNN4 "
                        "widths; see models/layers.py), or the per-block "
                        "fused Pallas kernels for the Omniglot CNN4 "
                        "(pallas/cnn4_pallas.py — conv-BN-ReLU never "
                        "round-trips HBM inside a block; a measured "
                        "loser at training shapes, kept as the stage-11 "
                        "post-mortem artifact)")
    p.add_argument("--no_nan_guard", dest="nan_guard", action="store_false",
                   default=defaults.nan_guard,
                   help="disable the divergence watchdog (by default a "
                        "non-finite training loss stops the run gracefully: "
                        "state saved, logger marked 'diverged')")
    return p


@dataclass
class RLScriptConfig:
    """Flag surface = the reference RL scripts (``rl/maml_trpo.py:19-40``
    field names + the TRPO/PPO-specific knobs). NUMERIC defaults are this
    framework's own compute-scaled working set — the reference's differ
    per script (maml_trpo: inner_lr 0.001 / outer_lr 0.3 / meta_batch 40 /
    horizon 150; maml_ppo: inner_lr 0.01 / outer_lr 0.01 / clip 0.1) and
    no single dataclass can match all of them; pass the reference values
    explicitly to reproduce a reference configuration."""
    env: str = "Particles2D-v1"
    outer_lr: float = 0.1
    inner_lr: float = 0.05
    adapt_steps: int = 1
    meta_batch_size: int = 20
    adapt_batch_size: int = 20
    num_iterations: int = 250
    save_every: int = 25
    seed: int = 42
    gamma: float = 0.99
    tau: float = 1.0
    max_path_length: int = 100
    # TRPO outer step
    backtrack_factor: float = 0.5
    ls_max_steps: int = 15
    max_kl: float = 0.01
    # PPO inner loop
    ppo_epochs: int = 3
    ppo_clip_ratio: float = 0.3
    # extras
    n_eval_tasks: int = 10
    fc_neurons: int = 100        # ANIL policy head width (reference anil_trpo.py:23)
    activation: str = "relu"     # DiagNormalPolicy activation; the
                                 # reference's params['activation'] knob
                                 # was dead (never passed), here it works
    workers: int = 1             # host physics thread-pool cap (reference
                                 # AsyncVectorEnv worker count)
    use_wandb: bool = False
    mesh: int = 1                # devices for task-DP sharding of the outer
                                 # step (TRPO CG/line-search AND Adam paths)
    profile: bool = False        # per-phase timing -> phase_times.json
    trace: str = ""              # jax.profiler trace dir (TensorBoard/XProf)
    fuse: int = 1                # iterations fused per XLA program (device envs)
    task_batch: bool = False     # host envs: collect the whole meta-batch
                                 # through one meta_batch*episodes vec env
    async_ckpt: bool = False     # checkpoint writes on a background thread
    resume: str = ""             # checkpoint .npz to resume from (params +
                                 # opt state + RNG + iteration; new capability)
    bf16: bool = False           # bf16 policy compute graph, f32 master params
    nan_guard: bool = True       # stop + save when train loss goes non-finite
    ckpt_backend: str = "npz"    # "npz" | "orbax" (utils/orbax_ckpt.py)
    host_policy: str = "device"  # host envs: where per-step policy forwards
                                 # run during collection — "device" (one
                                 # TPU round-trip per env step) or "cpu"
                                 # (local CPU backend; params sync once
                                 # per rollout, zero per-step crossings)
    compile_cache: str = ""      # persistent XLA compile cache dir
                                 # ("" = default location, "off" disables)

    def to_params(self) -> dict:
        return asdict(self)


def rl_argparser(defaults: RLScriptConfig,
                 description: str) -> argparse.ArgumentParser:
    force_cpu_if_requested()
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--env", type=str, default=defaults.env,
                   help="Environment (Particles2D-v1 | AntDirection-v1 | "
                        "ML1_<task> | ML10 | ML45)")
    p.add_argument("--outer_lr", type=float, default=defaults.outer_lr)
    p.add_argument("--inner_lr", type=float, default=defaults.inner_lr)
    p.add_argument("--adapt_steps", type=int, default=defaults.adapt_steps)
    p.add_argument("--meta_batch_size", type=int,
                   default=defaults.meta_batch_size)
    p.add_argument("--adapt_batch_size", type=int,
                   default=defaults.adapt_batch_size)
    p.add_argument("--num_iterations", type=int,
                   default=defaults.num_iterations)
    p.add_argument("--save_every", type=int, default=defaults.save_every)
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--max_path_length", type=int,
                   default=defaults.max_path_length)
    p.add_argument("--gamma", type=float, default=defaults.gamma)
    p.add_argument("--tau", type=float, default=defaults.tau)
    p.add_argument("--n_eval_tasks", type=int, default=defaults.n_eval_tasks)
    p.add_argument("--fc_neurons", type=int, default=defaults.fc_neurons,
                   help="ANIL policy head width")
    p.add_argument("--activation", choices=["relu", "tanh"],
                   default=defaults.activation,
                   help="DiagNormalPolicy hidden activation (the "
                        "reference's params knob, made functional; tanh "
                        "was its stated Meta-World setting)")
    p.add_argument("--workers", type=int, default=defaults.workers,
                   help="host-env physics parallelism: caps the native "
                        "thread pool (episode slots are sized from the "
                        "adapt/meta batch; device envs ignore this)")
    p.add_argument("--mesh", type=int, default=defaults.mesh,
                   help="Devices for task-DP sharding of the outer step")
    p.add_argument("--wandb", dest="use_wandb", action="store_true",
                   default=defaults.use_wandb)
    p.add_argument("--profile", action="store_true", default=defaults.profile,
                   help="record per-phase device times -> phase_times.json")
    p.add_argument("--trace", type=str, default=defaults.trace,
                   help="capture a jax.profiler device trace of the "
                        "training loop into this directory "
                        "(TensorBoard/XProf)")
    p.add_argument("--fuse", type=int, default=defaults.fuse,
                   help="meta-iterations fused into one XLA program "
                        "(device envs; composes with --mesh). The TRPO "
                        "step is latency-bound: --bf16 --fuse 20 is the "
                        "fast config (BASELINE.md r5s6c); past ~20 (or "
                        "f32 at 20) remote compile time blows up")
    p.add_argument("--task_batch", action="store_true",
                   default=defaults.task_batch,
                   help="host envs: collect all tasks' episodes in lockstep "
                        "through one meta_batch*episodes vec env (one policy "
                        "round-trip per step for the whole meta-batch)")
    p.add_argument("--async_ckpt", action="store_true",
                   default=defaults.async_ckpt,
                   help="write checkpoints on a background thread")
    p.add_argument("--ckpt_backend", choices=["npz", "orbax"],
                   default=defaults.ckpt_backend,
                   help="checkpoint format: npz files (default) or an "
                        "orbax CheckpointManager (per-shard async writes; "
                        "resume with --resume <run>/model_checkpoints)")
    p.add_argument("--resume", type=str, default=defaults.resume,
                   help="checkpoint (.npz file or orbax model_checkpoints "
                        "dir) to resume training from (restores params, "
                        "optimizer state, RNG and iteration)")
    p.add_argument("--bf16", action="store_true", default=defaults.bf16,
                   help="mixed precision: run the policy compute graph in "
                        "bf16 with f32 master params (accuracy parity-"
                        "gated, see scripts/parity_check.py --rl ... --bf16)")
    p.add_argument("--host_policy", choices=["device", "cpu"],
                   default=defaults.host_policy,
                   help="host envs: run per-step collection policy forwards "
                        "on the TPU ('device', one round-trip per env step) "
                        "or the local CPU backend ('cpu', params sync once "
                        "per rollout — wins when dispatch latency dominates "
                        "the tiny per-step matmul)")
    p.add_argument("--compile_cache", type=str, default=defaults.compile_cache,
                   help="persistent XLA compilation cache directory "
                        "(default ~/.cache/exploring_meta_tpu/xla; "
                        "'off' disables) — re-runs skip recompilation")
    p.add_argument("--no_nan_guard", dest="nan_guard", action="store_false",
                   default=defaults.nan_guard,
                   help="disable the divergence watchdog (by default a "
                        "non-finite training loss stops the run gracefully: "
                        "state saved, logger marked 'diverged')")
    return p
