#!/usr/bin/env python3
"""Meta-RL serving demo/load-test (exploring_meta_tpu/serve.py PolicyServer).

Loads a meta-trained policy checkpoint (or a fresh init with
--random_init), collects a support trajectory per task on the device env,
adapts the policy to every task in one batched XLA program, and measures
adaptation throughput plus per-step action latency — the runnable
counterpart of the serving section in BASELINE.md. The reference's only
deployment path is re-running its offline eval scripts
(misc_scripts/eval_rl.py) one task at a time.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser(description="Meta-RL serving load test")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="model.npz / checkpoint (omit with --random_init)")
    p.add_argument("--random_init", action="store_true",
                   help="serve a fresh init (throughput demo without a run)")
    p.add_argument("--algo", choices=["vpg", "ppo", "trpo"], default="vpg",
                   help="inner-update rule used for adaptation")
    p.add_argument("--activation", choices=["relu", "tanh"], default="relu",
                   help="DiagNormalPolicy hidden activation (must match the "
                        "checkpoint's training config)")
    p.add_argument("--anil", action="store_true",
                   help="ANIL policy (body frozen during adaptation)")
    p.add_argument("--fc_neurons", type=int, default=100,
                   help="ANIL policy head width")
    p.add_argument("--inner_lr", type=float, default=0.05)
    p.add_argument("--adapt_steps", type=int, default=1)
    p.add_argument("--episodes", type=int, default=20,
                   help="support episodes per task")
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--tasks", type=int, default=32,
                   help="concurrent adaptation requests per program")
    p.add_argument("--act_steps", type=int, default=200,
                   help="deployment steps to time after adaptation")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the request axis over an N-device mesh "
                        "(multi-chip serving; 0 = single device)")
    p.add_argument("--compile_cache", type=str, default="",
                   help="persistent XLA compile cache dir ('' = default "
                        "location, 'off' disables)")
    args = p.parse_args()
    if args.checkpoint is None and not args.random_init:
        p.error("give a checkpoint or pass --random_init")

    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()  # must precede any backend-touching call
    from exploring_meta_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)

    import jax
    import jax.numpy as jnp
    from exploring_meta_tpu import models, rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.serve import PolicyServer

    env = Particles2D()
    if args.anil:
        policy = models.DiagNormalPolicyANIL(
            input_size=env.obs_size, output_size=env.action_size,
            fc_neurons=args.fc_neurons,
            hiddens=(100, args.fc_neurons))
    else:
        policy = models.DiagNormalPolicy(
            input_size=env.obs_size, output_size=env.action_size,
            activation=args.activation)
    cfg = rl.RLConfig(inner_lr=args.inner_lr, adapt_steps=args.adapt_steps,
                      adapt_batch_size=args.episodes,
                      max_path_length=args.horizon)
    mesh = None
    if args.mesh:
        from exploring_meta_tpu.parallel.mesh import make_task_mesh
        mesh = make_task_mesh(args.mesh, axis="requests")
    if args.random_init:
        params = policy.init(jax.random.key(0))
        server = PolicyServer(policy, params, cfg, algo=args.algo,
                              mesh=mesh)
    else:
        server = PolicyServer.from_checkpoint(
            args.checkpoint, policy, cfg, algo=args.algo, mesh=mesh)
        params = server.params

    # Support collection: one rollout per task (the serving input — in
    # production these arrive from the deployed system's own env steps).
    roll = rl.make_rollout(env, policy.sample, episodes=args.episodes,
                           horizon=args.horizon)
    keys = jax.random.split(jax.random.key(1), args.tasks)
    tasks = env.sample_tasks(jax.random.key(2), args.tasks)
    supports = [roll(params, tasks[i], keys[i]) for i in range(args.tasks)]
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *supports)

    # Batched adaptation throughput: all tasks in one program.
    adapted = server.adapt_batched(stack)            # compile
    float(jax.tree_util.tree_leaves(adapted)[0].sum())
    t0 = time.perf_counter()
    for _ in range(args.reps):
        adapted = server.adapt_batched(stack)
    float(jax.tree_util.tree_leaves(adapted)[0].sum())  # host-fetch sync
    dt = (time.perf_counter() - t0) / args.reps
    print(f"adapt[{args.algo}{'/anil' if args.anil else ''}] "
          f"{args.tasks} tasks x {args.adapt_steps} step(s): "
          f"{args.tasks / dt:.0f} tasks/sec ({dt * 1e3:.1f} ms/batch)")

    # Deployment action latency on the first task's adapted params.
    one = jax.tree_util.tree_map(lambda x: x[0], adapted)
    obs = jnp.zeros((args.episodes, env.obs_size))
    a = server.act(one, obs)                         # compile
    float(a.sum())
    t0 = time.perf_counter()
    for _ in range(args.act_steps):
        a = server.act(one, obs)
    float(a.sum())
    dt = (time.perf_counter() - t0) / args.act_steps
    print(f"act: {dt * 1e6:.0f} us/step for {args.episodes} parallel envs "
          f"({1.0 / dt:.0f} steps/sec)")


if __name__ == "__main__":
    main()
