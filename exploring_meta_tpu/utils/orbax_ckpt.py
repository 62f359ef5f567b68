"""Orbax checkpoint backend (optional, ``--ckpt_backend orbax``).

The default npz checkpoints (utils/experiment.py) fetch every leaf to the
host process and write one file — exactly right for this model scale on
one chip, but it serializes through a single host and gathers sharded
arrays. Orbax is the standard TPU checkpoint layer the SURVEY.md §5
rebuild note names: every device writes its own shards (OCDBT), saves are
async by construction, and restore can target ANY sharding — so a
checkpoint written by an ``--mesh N`` run restores onto a different mesh
topology without a gather. Rebuilds the reference's
``utils/experiment.py:85-90`` save surface on that layer.

Gated: trainers default to npz; this module imports orbax lazily so the
base install never touches it.
"""

from __future__ import annotations

import os

import jax
import numpy as np


class OrbaxCheckpointer:
    """Async orbax-backed (step -> params/opt/rng) checkpoint store.

    Mirrors the npz checkpoint contract (params + optional optimizer
    state + RNG key + iteration) behind
    ``Experiment.save_model_checkpoint``/``load_checkpoint``.
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True))

    # -- write -------------------------------------------------------------

    def save(self, step: int, params, opt_state=None, rng_key=None) -> None:
        """Async save; returns immediately once the device arrays are
        snapshotted (training may keep mutating its own copies)."""
        state = {"params": params}
        if opt_state is not None:
            state["opt"] = opt_state
        if rng_key is not None:
            state["rng"] = jax.random.key_data(rng_key)
        self._mngr.save(int(step), args=self._ocp.args.StandardSave(state))

    def wait(self) -> None:
        """Block until pending async saves land on disk."""
        self._mngr.wait_until_finished()

    # -- read --------------------------------------------------------------

    def latest_step(self):
        return self._mngr.latest_step()

    def restore(self, params_template, opt_template=None, step=None,
                shardings=None):
        """-> (params, opt_state|None, rng_key|None, step).

        ``params_template``/``opt_template`` give structure and dtypes;
        ``shardings`` (an optional pytree matching ``params_template``)
        restores each param DIRECTLY into the given
        ``jax.sharding.Sharding`` — no host gather, no device-put after
        the fact. Saved states without opt/rng restore those as None.
        """
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint steps found")

        saved_keys = set(self._item_keys(step))
        if saved_keys == {"params"}:
            # A freshly opened CheckpointManager cannot always parse item
            # metadata ("provide a CheckpointHandlerRegistry"); discover
            # the real key set with a no-template restore (cheap at this
            # model scale), then re-restore typed below.
            raw = self._mngr.restore(
                int(step), args=self._ocp.args.StandardRestore())
            saved_keys = set(raw.keys())

        def abstract(tree, shard_tree=None):
            def leaf(path_leaf, sh=None):
                x = jax.numpy.asarray(path_leaf)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
            if shard_tree is None:
                return jax.tree_util.tree_map(leaf, tree)
            return jax.tree_util.tree_map(leaf, tree, shard_tree)

        tpl = {"params": abstract(params_template, shardings)}
        if opt_template is not None and "opt" in saved_keys:
            tpl["opt"] = abstract(opt_template)
        if "rng" in saved_keys:
            key_data = jax.random.key_data(jax.random.key(0))
            tpl["rng"] = jax.ShapeDtypeStruct(key_data.shape, key_data.dtype)

        state = self._mngr.restore(
            int(step), args=self._ocp.args.StandardRestore(tpl))
        rng = state.get("rng")
        if rng is not None:
            rng = jax.random.wrap_key_data(jax.numpy.asarray(rng))
        return state["params"], state.get("opt"), rng, int(step)

    def _item_keys(self, step: int):
        meta = self._mngr.item_metadata(int(step))
        # TreeMetadata keys() gives the saved top-level entries; fall back
        # to .tree for older orbax minors, then to params-only (restoring
        # opt/rng as None beats erroring on a structure mismatch).
        for obj in (meta, getattr(meta, "tree", None)):
            try:
                return list(obj.keys())
            except Exception:
                continue
        return ["params"]

    def close(self) -> None:
        self._mngr.close()


def is_orbax_checkpoint(path: str) -> bool:
    """True when ``path`` is an orbax CheckpointManager directory (the
    resume flag accepts either an .npz file or such a directory)."""
    return os.path.isdir(path)


def load_orbax_checkpoint(path: str, params_template, opt_template=None,
                          step=None, shardings=None):
    """One-shot restore mirroring experiment.load_checkpoint's signature:
    -> (params, opt_state|None, rng_key|None, iteration)."""
    ck = OrbaxCheckpointer(path)
    try:
        return ck.restore(params_template, opt_template, step=step,
                          shardings=shardings)
    finally:
        ck.close()
