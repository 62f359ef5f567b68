#!/usr/bin/env python3
"""Few-shot serving demo/load-test (exploring_meta_tpu/serve.py).

Loads a meta-trained checkpoint (or a fresh init with --random_init) and
serves synthetic request batches, printing latency/throughput stats —
the runnable counterpart of the serving section in BASELINE.md. The
reference has no serving path; its closest analog is re-running
misc_scripts/eval_vision.py per task.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser(description="Few-shot serving load test")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="model.npz / checkpoint (omit with --random_init)")
    p.add_argument("--random_init", action="store_true",
                   help="serve a fresh init (throughput demo without a run)")
    p.add_argument("--dataset", choices=["omni", "min"], default="omni")
    p.add_argument("--ways", type=int, default=5)
    p.add_argument("--shots", type=int, default=5)
    p.add_argument("--queries", type=int, default=15,
                   help="query examples per request")
    p.add_argument("--anil", action="store_true")
    p.add_argument("--inner_lr", type=float, default=0.5)
    p.add_argument("--adapt_steps", type=int, default=1)
    p.add_argument("--batch", type=int, default=64,
                   help="concurrent requests per program")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--f32", action="store_true",
                   help="serve in f32 (default bf16 compute)")
    p.add_argument("--compile_cache", type=str, default="",
                   help="persistent XLA compile cache dir ('' = default "
                        "location, 'off' disables) — restarts of the same "
                        "server config skip recompilation")
    args = p.parse_args()
    if args.checkpoint is None and not args.random_init:
        p.error("give a checkpoint or pass --random_init")

    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()  # must precede any backend-touching call
    from exploring_meta_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)

    import jax
    import jax.numpy as jnp
    from exploring_meta_tpu import models
    from exploring_meta_tpu.serve import VisionServer

    if args.dataset == "omni":
        spec = (models.anil_omniglot_spec(args.ways) if args.anil
                else models.omniglot_spec(args.ways))
        hw, ch = 28, 1
    else:
        spec = (models.anil_mini_imagenet_spec(args.ways) if args.anil
                else models.mini_imagenet_spec(args.ways))
        hw, ch = 84, 3

    kw = dict(inner_lr=args.inner_lr, adapt_steps=args.adapt_steps,
              anil=args.anil,
              compute_dtype=None if args.f32 else jnp.bfloat16)
    if args.random_init:
        params = models.init_cnn4(jax.random.key(0), spec)
        server = VisionServer(spec, params, **kw)
    else:
        server = VisionServer.from_checkpoint(args.checkpoint, spec, **kw)

    B, S = args.batch, args.shots * args.ways
    k1, k2 = jax.random.split(jax.random.key(1))
    sx = jax.random.normal(k1, (B, S, hw, hw, ch))
    sy = jnp.tile(jnp.arange(args.ways), (B, args.shots))
    qx = jax.random.normal(k2, (B, args.queries, hw, hw, ch))

    preds, _ = server.batch(sx, sy, qx)   # compile
    int(preds.sum())
    t0 = time.perf_counter()
    for _ in range(args.reps):
        preds, _ = server.batch(sx, sy, qx)
    int(preds.sum())                      # ground-truth host fetch
    dt = (time.perf_counter() - t0) / args.reps
    print(f"batch={B} {args.dataset} {args.ways}w{args.shots}s "
          f"{'anil' if args.anil else 'maml'} "
          f"{'f32' if args.f32 else 'bf16'}: "
          f"{B / dt:.0f} requests/sec, "
          f"batch latency {dt * 1e3:.1f} ms "
          f"({dt * 1e3 / B:.3f} ms/request)")


if __name__ == "__main__":
    main()
