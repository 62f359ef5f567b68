"""MAML/ANIL few-shot vision trainers.

Equivalent of reference ``vision/maml_vision.py`` / ``vision/anil_vision.py``
with the same training semantics (per-iteration train+valid meta-batches,
grad-averaged Adam outer step, checkpoint cadence, KeyboardInterrupt-safe
finish, final meta-test) — but the meta-iteration is one jitted XLA
program, optionally sharded over a device mesh (task-DP).
"""

from __future__ import annotations

import contextlib
import os

import jax
import optax
from tqdm import trange

from exploring_meta_tpu import adapt, models, parallel, tasks
from exploring_meta_tpu.utils.config import VisionConfig
from exploring_meta_tpu.utils.experiment import DivergenceError, Experiment
from exploring_meta_tpu.utils.profiling import PhaseTimer, device_trace


def _build_spec(cfg: VisionConfig, anil: bool):
    if cfg.dataset == "omni":
        return (models.anil_omniglot_spec(cfg.ways) if anil
                else models.omniglot_spec(cfg.ways))
    if cfg.dataset == "min":
        return (models.anil_mini_imagenet_spec(cfg.ways) if anil
                else models.mini_imagenet_spec(cfg.ways))
    raise SystemExit(f"Dataset not supported: {cfg.dataset}")


class VisionTrainer(Experiment):
    """Runs the full meta-training loop for MAML or ANIL vision."""

    def __init__(self, cfg: VisionConfig, anil: bool = False,
                 path: str = "results/"):
        algo = "anil" if anil else "maml"
        super().__init__(f"{algo}_{cfg.ways}w{cfg.shots}s", cfg.dataset,
                         cfg.to_params(), path=path, use_wandb=cfg.use_wandb)
        self.cfg = cfg
        self.anil = anil
        self.ckpt_backend = cfg.ckpt_backend

    def run(self) -> float:
        cfg = self.cfg
        train_ds, valid_ds, test_ds = tasks.get_dataset(
            cfg.dataset, seed=cfg.seed, synthetic=cfg.synthetic or None,
            synth_classes=cfg.synth_classes,
            synth_per_class=cfg.synth_per_class)

        # Always set it — a previous trainer in this process may have left
        # the module default on another lowering.
        from exploring_meta_tpu.models.layers import set_conv_impl
        set_conv_impl(cfg.conv_impl)

        spec = _build_spec(cfg, self.anil)
        key = jax.random.key(cfg.seed)
        key, init_key = jax.random.split(key)
        params = models.init_cnn4(init_key, spec)
        self.log_model(params)

        fast_adapt = adapt.make_vision_fast_adapt(
            spec, inner_lr=cfg.inner_lr, adapt_steps=cfg.adapt_steps,
            shots=cfg.shots, ways=cfg.ways, anil=self.anil,
            remat_body=cfg.remat_body)
        if cfg.bf16:
            # Mixed precision: bf16 compute graph, f32 master params/Adam
            # (the meta-step is HBM-bandwidth-bound; see BASELINE.md).
            fast_adapt = adapt.cast_compute(fast_adapt)
        opt = optax.adam(cfg.outer_lr)
        opt_state = opt.init(params)

        if cfg.resume:  # true mid-training resume (the reference cannot)
            from exploring_meta_tpu.utils.experiment import resume_training
            params, opt_state_r, key, start_iteration = resume_training(
                cfg.resume, params, opt_state, key)
            if opt_state_r is not None:
                opt_state = opt_state_r
        else:
            start_iteration = 0

        if cfg.fuse > 1:
            # the fused branch builds its own (optionally sharded) scans;
            # only the meta_eval below is shared
            meta_step = place = None
        elif cfg.mesh > 1:
            mesh = parallel.make_task_mesh(cfg.mesh)
            meta_step = parallel.make_sharded_meta_step(fast_adapt, opt, mesh)
            place = lambda batch: parallel.shard_task_batch(mesh, batch)
        else:
            meta_step = adapt.make_meta_step(fast_adapt, opt)
            place = lambda batch: batch
        meta_eval = adapt.make_meta_eval(fast_adapt)

        timer = PhaseTimer() if cfg.profile else None
        ph = (timer.phase if timer
              else (lambda name: contextlib.nullcontext([])))

        t = trange(start_iteration, cfg.num_iterations,
                   initial=start_iteration, total=cfg.num_iterations)
        iteration = start_iteration
        completed = start_iteration  # fused-path interrupt bookkeeping
        trace_ctx = (device_trace(cfg.trace) if cfg.trace
                     else contextlib.nullcontext())
        try:
          with trace_ctx:
            if cfg.fuse > 1:
                # Fused path: `fuse` whole meta-iterations (train step +
                # valid eval each) per XLA program — one dispatch per
                # chunk, identical per-iteration metrics.json contract.
                # Checkpoints land on chunk-end iterations. With --mesh N
                # each chip samples + trains its shard of the meta-batch
                # (pmean over ICI) inside the same fused program.
                mb = cfg.meta_batch_size
                if cfg.mesh > 1:
                    assert mb % cfg.mesh == 0, "meta_batch_size % mesh != 0"
                    mb = mb // cfg.mesh  # per-shard batch

                def sample_train(k, tr_imgs, va_imgs):
                    return tasks.sample_task_batch(
                        k, train_ds._replace(images=tr_imgs), cfg.ways,
                        cfg.shots, mb)

                def sample_valid(k, tr_imgs, va_imgs):
                    return tasks.sample_task_batch(
                        k, valid_ds._replace(images=va_imgs), cfg.ways,
                        cfg.shots, mb)

                scans = {}  # chunk length -> compiled program (<=2 entries)

                def run_chunk(n, params, opt_state, k):
                    if n not in scans:
                        if cfg.mesh > 1:
                            scans[n] = parallel.make_sharded_train_scan(
                                fast_adapt, opt, sample_train, n,
                                parallel.make_task_mesh(cfg.mesh),
                                eval_sample_local=sample_valid)
                        else:
                            scans[n] = adapt.make_train_scan(
                                fast_adapt, opt, sample_train, n,
                                eval_sample_fn=sample_valid)
                    return scans[n](params, opt_state, k,
                                    train_ds.images, valid_ds.images)

                from exploring_meta_tpu.trainers.fused import (
                    drive_fused_chunks,
                )

                def chunk(n, state, k):
                    p, o = state
                    with ph("train_chunk") as sync:
                        p, o, ms = run_chunk(n, p, o, k)
                        sync.append(ms)
                    return (p, o), ms

                def track(state, i):
                    # `completed` is the COUNT of finished iterations so
                    # the interrupt path records the same value the
                    # non-fused in-flight index would (= metrics rows).
                    nonlocal params, opt_state, completed
                    params, opt_state = state
                    completed = i + 1

                (params, opt_state), iteration, key = drive_fused_chunks(
                    total=cfg.num_iterations, fuse=cfg.fuse,
                    save_every=cfg.save_every, key=key,
                    state=(params, opt_state), run_chunk=chunk,
                    log_step=lambda ms, j: self.log_metrics({
                        "train_loss": float(ms["loss"][j]),
                        "train_acc": float(ms["metric"][j]),
                        "valid_loss": float(ms["valid_loss"][j]),
                        "valid_acc": float(ms["valid_metric"][j]),
                    }),
                    postfix=lambda ms: {
                        "train_acc": float(ms["metric"][-1]),
                        "valid_acc": float(ms["valid_metric"][-1])},
                    save_ckpt=lambda state, i, k: self.save_model_checkpoint(
                        state[0], i, opt_state=state[1], rng_key=k,
                        async_write=cfg.async_ckpt),
                    progress=t, on_chunk=track, start=start_iteration)
            else:
                for iteration in t:
                    key, k_tr, k_va = jax.random.split(key, 3)
                    with ph("sample") as sync:
                        data, labels = place(tasks.sample_task_batch(
                            k_tr, train_ds, cfg.ways, cfg.shots,
                            cfg.meta_batch_size))
                        sync.append(data)
                    with ph("valid_eval") as sync:
                        # PRE-update params: the reference's valid pass
                        # runs before opt.step() (maml_vision.py:117-141)
                        v_data, v_labels = tasks.sample_task_batch(
                            k_va, valid_ds, cfg.ways, cfg.shots,
                            cfg.meta_batch_size)
                        valid_m = meta_eval(params, v_data, v_labels)
                        sync.append(valid_m)

                    with ph("meta_step") as sync:
                        params, opt_state, train_m = meta_step(
                            params, opt_state, data, labels)
                        sync.append(train_m)

                    metrics = {
                        "train_loss": float(train_m["loss"]),
                        "train_acc": float(train_m["metric"]),
                        "valid_loss": float(valid_m["loss"]),
                        "valid_acc": float(valid_m["metric"]),
                    }
                    t.set_postfix(metrics)
                    self.log_metrics(metrics)

                    if iteration % cfg.save_every == 0:
                        self.save_model_checkpoint(params, iteration,
                                                   opt_state=opt_state,
                                                   rng_key=key,
                                                   async_write=cfg.async_ckpt)
        except (KeyboardInterrupt, DivergenceError) as stop:
            # in fused mode `key` may still be the pre-loop key here —
            # splitting it for the final meta-test would reproduce
            # training chunk 1's stream
            key = jax.random.fold_in(key, 0x5eed)
            self.mark_stopped(stop,
                              completed if cfg.fuse > 1 else iteration)

        self.flush_checkpoints()
        self.save_model(params)
        self.logger["elapsed_time"] = (
            f"{round(t.format_dict['elapsed'], 2)} sec")
        if timer:
            timer.save(os.path.join(self.model_path, "phase_times.json"))
            print("Phase times:", timer.summary())

        key, k_te = jax.random.split(key)
        t_data, t_labels = tasks.sample_task_batch(
            k_te, test_ds, cfg.ways, cfg.shots, cfg.meta_batch_size)
        test_m = meta_eval(params, t_data, t_labels)
        test_acc = float(test_m["metric"])
        print("Meta Test Accuracy", test_acc)
        self.logger["test_acc"] = test_acc
        self.log_metrics({"test_acc": test_acc})
        self.save_logs_to_file()
        return test_acc
