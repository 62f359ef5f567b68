#!/usr/bin/env python3
"""Isolate which stage of the fused-CNN4 (stage-11) meta-step kills the
remote TPU compile helper (r4s3: SIGKILL = OOM on the compile server for
`--conv_impl pallas` bench/roofline programs, while the on-chip unit
tests of the same kernels pass).

Each --stage compiles ONE sub-program of the meta-step, smallest first,
in a fresh process, and prints the compile wall time. Run stages in
sequence (separate processes — a SIGKILL'd helper poisons nothing):

    python scripts/pallas_isolate.py --stage fwd   --meta_batch 32
    python scripts/pallas_isolate.py --stage grad  --meta_batch 32
    python scripts/pallas_isolate.py --stage adapt --meta_batch 32
    python scripts/pallas_isolate.py --stage meta  --meta_batch 4
    python scripts/pallas_isolate.py --stage meta  --meta_batch 32

Stages:
  fwd    vmapped fused base forward only (batched fwd Mosaic kernel)
  grad   + first-order per-task grads (adds the batched bwd kernel)
  adapt  + one MAML inner step and the query loss (fwd+bwd, no 2nd order)
  meta   + the meta-gradient (adds the custom_jvp double-backward path)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WAYS, SHOTS = 5, 5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["fwd", "grad", "adapt", "meta"],
                   required=True)
    p.add_argument("--meta_batch", type=int, default=32)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    import jax.numpy as jnp
    from exploring_meta_tpu import models
    from exploring_meta_tpu.models.layers import set_conv_impl, set_precision
    from exploring_meta_tpu.models.cnn4 import omniglot_spec
    from exploring_meta_tpu.ops.losses import cross_entropy
    from exploring_meta_tpu.pallas.cnn4_pallas import fused_omni_base

    set_conv_impl("pallas")
    if args.bf16:
        set_precision("default")

    B, N = args.meta_batch, WAYS * SHOTS
    spec = omniglot_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    pb = jax.tree_util.tree_map(
        lambda p: jnp.stack([p + 0.01 * i for i in range(B)]), params)
    xs = jax.random.normal(jax.random.key(1), (B, N, 28, 28, 1), jnp.float32)
    xq = jax.random.normal(jax.random.key(2), (B, N, 28, 28, 1), jnp.float32)
    ys = jnp.tile(jnp.arange(N) % WAYS, (B, 1))

    def task_loss(p, x, y):
        feats = fused_omni_base(p["base"], x)
        logits = feats @ p["head"]["w"] + p["head"]["b"]
        return cross_entropy(logits, y)

    def inner_adapted(p, x, y):
        g = jax.grad(task_loss)(p, x, y)
        return jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g)

    if args.stage == "fwd":
        fn = jax.jit(jax.vmap(lambda p, x: fused_omni_base(p["base"], x)))
        call = (pb, xs)
    elif args.stage == "grad":
        fn = jax.jit(jax.vmap(jax.grad(task_loss)))
        call = (pb, xs, ys)
    elif args.stage == "adapt":
        def adapt_one(p, x, y, xq_):
            ad = inner_adapted(p, x, y)
            return task_loss(ad, xq_, y)
        fn = jax.jit(jax.vmap(adapt_one))
        call = (pb, xs, ys, xq)
    else:  # meta
        def meta_loss(p, x, y, xq_):
            def per_task(xi, yi, xqi):
                ad = inner_adapted(p, xi, yi)
                return task_loss(ad, xqi, yi)
            return jnp.mean(jax.vmap(per_task)(x, y, xq_))
        fn = jax.jit(jax.grad(meta_loss))
        call = (params, xs, ys, xq)

    print(f"stage={args.stage} meta_batch={B} N={N} bf16={args.bf16} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    lowered = fn.lower(*call)
    print(f"lowered in {time.perf_counter()-t0:.1f}s "
          f"(MLIR {len(lowered.as_text())/1e6:.2f} MB)", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = compiled(*call)
    val = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"executed in {time.perf_counter()-t0:.2f}s, leaf0={val:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
