"""Experiment harness: run dirs, metric logs, checkpoints.

Keeps the reference's artifact contract byte-compatible where analysis
tooling parses it (``utils/experiment.py:13-95``):

    results/<algo>_<dataset>_<date>_<seed>_<rand>/
        logger.json        config + metadata (incl. 'elapsed_time',
                           'test_acc', 'manually_stopped')
        metrics.json       {metric_name: [values...]}
        model.npz          final params (flat {path: array}; the
                           reference's model.pt equivalent)
        model_checkpoints/model_<iter>.npz

Adds what the reference lacks (SURVEY.md §5): true resume — checkpoints
optionally include optimizer state and RNG key so training can continue
mid-run, not just be evaluated offline.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
import jax


def flatten_params(tree, prefix: str = "") -> dict:
    """Pytree -> flat {slash/path: np.ndarray} dict (npz-serializable)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        flat[(prefix + key) if prefix else key] = np.asarray(leaf)
    return flat


def unflatten_into(tree, flat: dict, prefix: str = ""):
    """Inverse of :func:`flatten_params` given a structural template."""
    def rebuild(path, leaf):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        return jax.numpy.asarray(flat[(prefix + key) if prefix else key],
                                 dtype=leaf.dtype)
    return jax.tree_util.tree_map_with_path(rebuild, tree)


def list_checkpoints(run_dir: str) -> list:
    """Numerically sorted ``[(step, path)]`` of
    ``model_checkpoints/model_<step>.npz`` under ``run_dir`` (lexicographic
    sorting would put model_10 before model_2)."""
    import glob
    import re
    out = []
    for path in glob.glob(os.path.join(run_dir, "model_checkpoints",
                                       "model_*.npz")):
        m = re.search(r"model_(\d+)\.npz$", path)
        if m:
            out.append((int(m.group(1)), path))
    return sorted(out)


def resume_training(resume_path: str, params, opt_template, key):
    """Shared mid-training resume (vision + RL trainers): restore params,
    optimizer state (when the checkpoint carries one), and the RNG key,
    and return the iteration to CONTINUE at. Checkpoints are written
    AFTER iteration i completes, so the resumed run continues at i + 1 —
    re-running i would apply a duplicate update on already-updated
    params.

    -> ``(params, opt_state_or_None, key, start_iteration)``."""
    params, opt_state, rng_key, done_iter = load_checkpoint(
        resume_path, params, opt_template)
    if rng_key is not None:
        key = rng_key
    start = done_iter + 1
    print(f"Resumed from {resume_path}: iteration {done_iter} done, "
          f"continuing at {start}")
    return params, opt_state, key, start


class DivergenceError(RuntimeError):
    """Raised by the training-loss watchdog when a logged ``*loss`` metric
    goes non-finite. Trainers catch it next to KeyboardInterrupt and run
    the same graceful finish (mark logger, save state, evaluate) — failure
    detection the reference lacks (SURVEY.md §5): a diverged run preserves
    its artifacts and the iteration it died at instead of burning the rest
    of its budget on NaNs."""


class Experiment:
    """Logger/checkpointer each trainer inherits (reference Experiment)."""

    def __init__(self, algo: str, dataset: str, params: dict,
                 path: str = "results/", use_wandb: bool = False):
        params = dict(params)
        params["algo"] = algo
        params["dataset"] = dataset
        params.setdefault("seed", 42)
        self.params = params
        self.nan_guard = bool(params.get("nan_guard", True))

        # Persistent XLA compile cache: default ON for every experiment
        # (fresh-process recompiles cost minutes through the remote
        # runtime); "off" in the config disables.
        from exploring_meta_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(params.get("compile_cache", ""))

        rng = np.random.default_rng()
        self.logger = {
            "config": self.params,
            "date": datetime.datetime.now().strftime("%d_%m_%Hh%M"),
            "model_id": f"{params['seed']}_{rng.integers(1, 9999)}",
        }
        self.metrics: dict = {}

        os.makedirs(path, exist_ok=True)
        self.model_path = os.path.join(
            path, f"{algo}_{dataset}_{self.logger['date']}_{self.logger['model_id']}")
        os.makedirs(self.model_path)
        os.makedirs(os.path.join(self.model_path, "model_checkpoints"))

        self._ckpt_executor = None
        self._ckpt_futures: list = []
        # "npz" (default) or "orbax" (utils/orbax_ckpt.py: per-shard async
        # writes, restore-to-sharding); trainers set this from config.
        self.ckpt_backend = "npz"
        self._orbax = None

        self._use_wandb = False
        if use_wandb:  # optional, gated: wandb is not in the base image
            try:
                import wandb
                self._wandb = wandb.init(
                    project="exploring_meta_tpu",
                    id=f"{algo}_{dataset}_{self.logger['model_id']}",
                    config=self.params, tags=[algo, dataset])
                self._use_wandb = True
            except Exception as e:  # pragma: no cover
                print(f"wandb unavailable ({e}); continuing without it")

    # -- metrics -----------------------------------------------------------

    def log_metrics(self, metrics: dict, step: int | None = None) -> None:
        diverged = None
        for key, value in metrics.items():
            scalar = (float(value)
                      if np.isscalar(value) or hasattr(value, "item")
                      else value)
            self.metrics.setdefault(key, []).append(scalar)
            # NaN watchdog (``nan_guard`` config key, default on): the
            # non-finite value is appended first so metrics.json keeps the
            # evidence, then the loop is unwound via DivergenceError.
            if (self.nan_guard and "loss" in key
                    and isinstance(scalar, float) and not np.isfinite(scalar)):
                diverged = (key, scalar)
        if self._use_wandb:  # pragma: no cover
            self._wandb.log(metrics, step=step)
        if diverged is not None:
            raise DivergenceError(
                f"{diverged[0]} = {diverged[1]} at logged step "
                f"{len(self.metrics[diverged[0]]) - 1}")

    def mark_stopped(self, exc: BaseException,
                     iteration: int | None = None) -> None:
        """Shared KeyboardInterrupt/DivergenceError bookkeeping for the
        trainers' graceful-finish path. ``iteration`` truncates the
        recorded ``num_iterations`` the way the reference does on
        interrupt.

        Fused-chunk note: inside a ``--fuse K`` chunk only chunk-boundary
        state exists on the host, so on divergence the saved params are
        the last finite chunk boundary and ``num_iterations`` rolls back
        to it, while metrics.json keeps the per-iteration rows up to (and
        including) the non-finite one — ``logger['diverged']`` names the
        exact logged step for forensics."""
        if isinstance(exc, DivergenceError):
            print(f"\nTraining loss diverged ({exc}) — stopping, saving "
                  "state & evaluating...\n")
            self.logger["diverged"] = str(exc)
        else:
            print("\nManually stopped training! Start evaluation & "
                  "saving...\n")
            self.logger["manually_stopped"] = True
        if iteration is not None:
            self.params["num_iterations"] = iteration

    def log_model(self, params, name: str = "model") -> None:
        """Architecture summary dump (reference's torchsummary analog)."""
        lines = [f"{k}: shape={v.shape} params={v.size}"
                 for k, v in flatten_params(params).items()]
        total = sum(v.size for v in flatten_params(params).values())
        lines.append(f"TOTAL PARAMS: {total}")
        info = "\n".join(lines)
        print(info)
        with open(os.path.join(self.model_path, f"{name}.summary"), "w") as f:
            f.write(info)

    def save_logs_to_file(self) -> None:
        # Strict-JSON artifact contract: non-finite floats (a diverged
        # run's recorded NaN/inf evidence — metric rows, final_eval
        # rewards, test metrics) serialize as null — bare NaN tokens
        # would make the whole file unreadable to standard parsers.
        def finite(v):
            if isinstance(v, float) and not np.isfinite(v):
                return None
            if isinstance(v, dict):
                return {k: finite(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [finite(x) for x in v]
            return v

        with open(os.path.join(self.model_path, "metrics.json"), "w") as f:
            json.dump(finite(self.metrics), f)
        with open(os.path.join(self.model_path, "logger.json"), "w") as f:
            json.dump(finite(self.logger), f, sort_keys=True, indent=4,
                      default=str)

    # -- checkpoints ---------------------------------------------------------

    def save_model(self, params, name: str = "model") -> None:
        np.savez(os.path.join(self.model_path, f"{name}.npz"),
                 **flatten_params(params))

    def save_model_checkpoint(self, params, iteration, name: str = "model",
                              opt_state=None, rng_key=None,
                              async_write: bool = False) -> None:
        """Checkpoint with optional resume state (opt/rng), which the
        reference lacks.

        ``async_write=True`` offloads the device->host fetch and npz write
        to a single background thread (SURVEY.md §5: periodic async
        checkpointing for preemptible TPUs) — the training loop keeps
        dispatching while the previous checkpoint drains. Call
        :meth:`flush_checkpoints` before reading the files back.

        With ``self.ckpt_backend == "orbax"`` the checkpoint goes to an
        orbax CheckpointManager under ``model_checkpoints/`` instead
        (always async; resume via ``--resume <run>/model_checkpoints``)."""
        if self.ckpt_backend == "orbax":
            if self._orbax is None:
                from exploring_meta_tpu.utils.orbax_ckpt import (
                    OrbaxCheckpointer,
                )
                self._orbax = OrbaxCheckpointer(
                    os.path.join(self.model_path, "model_checkpoints"))
            self._orbax.save(iteration, params, opt_state=opt_state,
                             rng_key=rng_key)
            return
        out = os.path.join(self.model_path, "model_checkpoints",
                           f"{name}_{iteration}.npz")
        if rng_key is not None:
            rng_key = np.asarray(jax.random.key_data(rng_key))

        def write():
            flat = flatten_params(params)
            if opt_state is not None:
                flat.update(flatten_params(opt_state, prefix="__opt__/"))
            if rng_key is not None:
                flat["__rng__"] = rng_key
            flat["__iteration__"] = np.asarray(int(iteration))
            np.savez(out, **flat)

        if async_write:
            if self._ckpt_executor is None:
                from concurrent.futures import ThreadPoolExecutor
                self._ckpt_executor = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt")
            self._ckpt_futures.append(self._ckpt_executor.submit(write))
        else:
            write()

    def flush_checkpoints(self) -> None:
        """Block until all async checkpoint writes land (re-raises write
        errors). Trainers call this before final save/eval."""
        for f in self._ckpt_futures:
            f.result()
        self._ckpt_futures.clear()
        if self._orbax is not None:
            self._orbax.wait()

    def save_acc_matrix(self, acc_matrix) -> None:
        print("Saving accuracy matrix..")
        print(acc_matrix)
        np.savetxt(os.path.join(self.model_path, "acc_matrix.out"),
                   np.asarray(acc_matrix), fmt="%1.2f")


def load_params(path: str, template):
    """Load a model.npz / checkpoint into the structure of ``template``."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_into(template, flat)


def load_checkpoint(path: str, params_template, opt_template=None):
    """-> (params, opt_state|None, rng_key|None, iteration).

    ``path`` is either a checkpoint ``.npz`` or an orbax
    CheckpointManager directory (a ``model_checkpoints/`` dir written
    under ``--ckpt_backend orbax``; restores the latest step)."""
    if os.path.isdir(path):
        from exploring_meta_tpu.utils.orbax_ckpt import (
            load_orbax_checkpoint,
        )
        return load_orbax_checkpoint(path, params_template, opt_template)
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = unflatten_into(params_template, flat)
    opt_state = None
    if opt_template is not None and any(k.startswith("__opt__/") for k in flat):
        opt_state = unflatten_into(opt_template, flat, prefix="__opt__/")
    rng_key = None
    if "__rng__" in flat:
        rng_key = jax.random.wrap_key_data(jax.numpy.asarray(flat["__rng__"]))
    iteration = int(flat.get("__iteration__", 0))
    return params, opt_state, rng_key, iteration
