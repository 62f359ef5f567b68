"""Whole-sweep-as-ONE-program multi-seed training (vmap over a seed axis).

The reference's multi-seed workflow is N separate process runs fed to
``misc_scripts/plot_stuff.py:10-74`` by hand; ``scripts/sweep.py``
collapses that to N sequential in-process runs. This module collapses it
further, the TPU-native end state: ALL seeds train simultaneously in one
XLA program — the fused train scans (``adapt/maml.py:156`` /
``rl/train_scan.py``) are pure functions of ``(params, opt_state, key)``,
so a seed sweep is just ``vmap`` over stacked per-seed state with the
dataset broadcast. Seeds share every compiled op and the MXU sees the
seed axis as extra batch — on a single chip an S-seed sweep costs far
less than S serial runs wherever the per-seed batch under-fills the
hardware.

With a :class:`~jax.sharding.Mesh`, the seed axis is GSPMD-sharded
across chips instead: seeds are independent (zero collectives), so an
8-chip sweep runs at one seed's wall-clock — embarrassingly parallel
scaling the reference's one-process-per-seed workflow pays for with N
full training latencies.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_seed_states(init_fn: Callable, seeds: Sequence[int], opt=None):
    """Per-seed initial training state, stacked on a leading seed axis.

    Mirrors the trainers' RNG derivation exactly (``trainers/vision.py:58-60``,
    ``trainers/rl.py:110-112``): ``key(seed)`` is split once into the
    training carry key and the init key, and ``init_fn(init_key)`` builds
    the params — so seed ``s`` of the stack starts from the same params
    and key stream as a solo run with ``--seed s``.

    -> ``(params_stack, opt_state_stack | None, carry_keys)`` with leading
    axis ``len(seeds)``.
    """
    params_list, key_list = [], []
    for s in seeds:
        key = jax.random.key(int(s))
        key, ik = jax.random.split(key)
        params_list.append(init_fn(ik))
        key_list.append(key)
    params = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    keys = jnp.stack(key_list)
    opt_state = None
    if opt is not None:
        opt_state = jax.vmap(opt.init)(params)
    return params, opt_state, keys


def vmap_seeds(train: Callable, n_stacked: int, n_data: int = 0,
               mesh: Mesh | None = None):
    """Lift a fused train scan over a leading seed axis.

    ``train`` is any pure training program whose first ``n_stacked``
    arguments are per-seed state (params / opt_state / RNG key) and whose
    trailing ``n_data`` arguments are seed-independent data to broadcast
    (the packed dataset arrays of ``adapt.make_train_scan``). Returns
    ``sweep(*stacked_state, *data)`` running every seed in one jitted
    program; every output keeps the leading seed axis.

    With ``mesh``, stacked state is committed sharded over the mesh's
    first axis and data replicated before the call, so GSPMD partitions
    the whole sweep by seed (the seed count must be a multiple of the
    mesh size — seeds cannot be split across chips).
    """
    axes = (0,) * n_stacked + (None,) * n_data
    vf = jax.jit(jax.vmap(train, in_axes=axes))
    if mesh is None:
        return vf

    def sweep(*args):
        if len(args) != n_stacked + n_data:
            raise TypeError(f"sweep() takes {n_stacked}+{n_data} args, "
                            f"got {len(args)}")
        stacked, data = args[:n_stacked], args[n_stacked:]
        n_seeds = jax.tree.leaves(stacked[0])[0].shape[0]
        if n_seeds % mesh.size:
            raise ValueError(
                f"{n_seeds} seeds cannot shard evenly over the "
                f"{mesh.size}-device mesh — use a seed count that is a "
                f"multiple of the mesh size (pad with extra seeds)")
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        repl = NamedSharding(mesh, P())
        stacked = tuple(jax.device_put(s, shard) for s in stacked)
        data = tuple(jax.device_put(d, repl) for d in data)
        return vf(*stacked, *data)

    return sweep
