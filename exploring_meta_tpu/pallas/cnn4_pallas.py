"""Fused CNN4 base Pallas kernels (SURVEY §7.2 stage 11).

Rebuilds the hot path of the reference's OmniglotCNN ConvBase
(``core_functions/vision_models.py:38-55,149-193``: 4x [conv3x3 stride-2
-> BN -> ReLU], then the global spatial mean feeding the linear head) as
PER-BLOCK fused Pallas kernels: one Mosaic program per conv-BN-ReLU
block (4 fwd + 4 bwd programs). Within a block, conv output, BN
statistics and the ReLU mask never round-trip HBM — the fusion XLA
cannot do, because BN's batch statistics need a full reduction over the
conv output before normalization can start; only the 4 small
block-boundary activations touch HBM.

History (BASELINE.md stage-11 post-mortem): a whole-base twin (all 4
blocks in ONE program pair) existed through round 4 and was
A/B-disqualified on-chip — Mosaic compile cost grows superlinearly with
program size; its backward OOM-killed the remote compile server at every
meta-batch and even its forward ran 534 s at production shapes. The
per-block mode compiles and matches the XLA path on-chip, but its
AD-transposed backward VMEM-OOMs at production shapes (145 MB register
spill + 128x lane padding on 1-channel-minor residuals), so the XLA path
remains the default; these kernels are the documented, reproducible
artifact of that investigation (opt-in: ``--conv_impl pallas``). The
whole-base twin was removed in round 5 and lives in git history.

Stride-2 taps without strided slices: Mosaic lowers neither strided
slices (gather) nor scatter, so the padded input is reshaped to the
parity-decomposed form [N, Hp/2, 2, Wp/2, 2, C] — both spatial dims
split into (half, parity) WITHOUT touching the lane (channel) dim,
which Mosaic accepts (the lane-merging [.., 2C] variant does not). The
9 conv taps become *static* slices: tap (dy, dx) lives at plane row
``dy//2 + i``, row-parity ``dy % 2``, column ``dx//2 + j``, col-parity
``dx % 2``. The transposed-conv scatter in the backward becomes a sum
of ``lax.pad``-embedded tap cotangents into the same decomposition.

MAML needs second-order meta-gradients THROUGH the backward (the inner
``jax.grad`` gets differentiated again), so the backward op carries its
own ``custom_vjp`` whose rules fall back to plain-JAX autodiff of the
reference formulation (``models.cnn4.base_apply``) — the double-backward
runs once per meta-step on the support batch only, in XLA.

Numerics: the kernels compute in f32 regardless of the input dtype
(bf16 inputs under ``adapt.cast_compute`` are upcast after the HBM read,
so the HBM traffic still halves); verified against the XLA path in
``tests/test_pallas_cnn4.py`` (interpret mode) and
``tests/test_pallas_tpu.py`` (real chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # layers.batch_norm default (torch BatchNorm2d eps)
_N_BLOCKS = 4
_PER_BLOCK = 4  # w, b, scale, bias


# ---------------------------------------------------------------------------
# in-kernel math (traced inside the Pallas kernels, everything in VMEM)
# ---------------------------------------------------------------------------

def _pad_even(x):
    """Zero-pad H and W by 1 low, then to even extents (lax.pad — Mosaic
    has no scatter, and ``.at[].set`` of a slice lowers to one)."""
    n, h, w, c = x.shape
    hp = h + 2 + (h % 2)
    wp = w + 2 + (w % 2)
    return lax.pad(x, jnp.zeros((), x.dtype),
                   [(0, 0, 0), (1, hp - h - 1, 0),
                    (1, wp - w - 1, 0), (0, 0, 0)])


def _parity_view(xpad):
    """[N, Hp, Wp, C] -> [N, Hp/2, 2, Wp/2, 2, C] (pure reshape).

    Both H and W split into (half, parity) WITHOUT touching the lane
    (channel) dim — Mosaic lowers these splits, while the lane-merging
    [.., Wp/2, 2C] form and any stride-2 slice (gather) do not."""
    n, hp, wp, c = xpad.shape
    return xpad.reshape(n, hp // 2, 2, wp // 2, 2, c)


def _tap(view, c, dy, dx, ho, wo):
    """Static slice of the parity view = the stride-2 conv tap (dy, dx)."""
    del c
    return view[:, dy // 2:dy // 2 + ho, dy % 2,
                dx // 2:dx // 2 + wo, dx % 2, :]


def _out_hw(h):
    return (h - 1) // 2 + 1  # conv3x3, stride 2, pad 1


def _conv_s2(a_prev, w):
    """Stride-2 3x3 conv via 9 static parity taps; f32 accumulation."""
    n, h, wd, ci = a_prev.shape
    co = w.shape[3]
    ho, wo = _out_hw(h), _out_hw(wd)
    view = _parity_view(_pad_even(a_prev))
    acc = jnp.zeros((n * ho * wo, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = _tap(view, ci, dy, dx, ho, wo).reshape(n * ho * wo, ci)
            if ci == 1:
                acc = acc + t * w[dy, dx, 0, :][None, :]
            else:
                acc = acc + jnp.dot(t, w[dy, dx],
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
    return acc.reshape(n, ho, wo, co)


def _block_fwd(a_prev, w, b, scale, bias):
    """conv -> batch-stat BN -> ReLU; returns (a, xhat, inv_std)."""
    y = _conv_s2(a_prev, w) + b
    mu = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=(0, 1, 2), keepdims=True)
    inv = lax.rsqrt(var + _EPS)
    xh = (y - mu) * inv
    a = jnp.maximum(xh * scale + bias, 0.0)
    return a, xh, inv


def _conv_s2_bwd(a_prev, d_out, w):
    """Backward of ``_conv_s2 + b``: returns (dw, db, da_prev).

    dw via tap^T @ d_out (contracting the N*Ho*Wo axis — an MXU-shaped
    matmul); da_prev via the transposed scatter into the same parity
    decomposition the forward taps slice from.
    """
    n, h, wd, ci = a_prev.shape
    ho, wo, co = d_out.shape[1], d_out.shape[2], d_out.shape[3]
    hp = h + 2 + (h % 2)
    wp = wd + 2 + (wd % 2)
    view = _parity_view(_pad_even(a_prev))
    df = d_out.reshape(n * ho * wo, co)
    # transposed scatter = lax.pad-embedded adds into the 6D parity view
    # (Mosaic has no scatter; pad with static low/high config lowers)
    dview = jnp.zeros((n, hp // 2, 2, wp // 2, 2, ci), jnp.float32)
    dw_rows = []
    for dy in range(3):
        row = []
        for dx in range(3):
            t = _tap(view, ci, dy, dx, ho, wo).reshape(n * ho * wo, ci)
            # [ci, co]: contract the M axis of both (no transposes)
            row.append(lax.dot_general(
                t, df, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32))
            # [M, ci]: contract the co axis (w[dy,dx] is [ci, co])
            dt = lax.dot_general(
                df, w[dy, dx], (((1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            dt6 = dt.reshape(n, ho, 1, wo, 1, ci)
            dview = dview + lax.pad(
                dt6, jnp.float32(0),
                [(0, 0, 0),
                 (dy // 2, hp // 2 - ho - dy // 2, 0),
                 (dy % 2, 1 - dy % 2, 0),
                 (dx // 2, wp // 2 - wo - dx // 2, 0),
                 (dx % 2, 1 - dx % 2, 0),
                 (0, 0, 0)])
        dw_rows.append(jnp.stack(row))
    dw = jnp.stack(dw_rows)                       # [3, 3, ci, co]
    db = jnp.sum(df, axis=0)                      # [co]
    da_pad = dview.reshape(n, hp, wp, ci)
    return dw, db, da_pad[:, 1:1 + h, 1:1 + wd, :]


def _block_bwd(da, xh, inv, scale, bias):
    """Backward of BN(batch-stats, biased var) -> ReLU.

    Returns (dy, dscale, dbias) where dy is the cotangent of the conv
    output y.
    """
    dz = da * ((xh * scale + bias) > 0)
    dscale = jnp.sum(dz * xh, axis=(0, 1, 2))
    dbias = jnp.sum(dz, axis=(0, 1, 2))
    dxh = dz * scale
    dy = inv * (dxh
                - jnp.mean(dxh, axis=(0, 1, 2), keepdims=True)
                - xh * jnp.mean(dxh * xh, axis=(0, 1, 2), keepdims=True))
    return dy, dscale, dbias


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _interpret():
    return jax.default_backend() == "cpu"


# The 6D parity views pad their tiny minor dims (2, C) up to the (8, 128)
# tile, so the per-task working set exceeds Mosaic's conservative 16 MB
# scoped-vmem default; the real v5e VMEM is 128 MB, and the whole point
# of the kernel is holding every intermediate there.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# One grid step per task in the batched kernels; "arbitrary" lets Mosaic
# pipeline the next task's input DMA under the current task's compute.
_COMPILER_PARAMS_BATCHED = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
    dimension_semantics=("arbitrary",))


# ---------------------------------------------------------------------------
# task-batched kernels (custom vmap rules)
#
# Auto-vmap of a pallas_call inserts a grid dim whose per-task blocks
# break TPU tiling for the 1-D params ([B, C] blocked to (1, C): the
# leading 1 is neither 8-divisible nor equal to B). Instead: explicit
# grid over tasks, 1-D params lifted to [B, 1, C] (block (1, 1, C) —
# last two dims equal the array's, which Mosaic accepts), weights
# blocked (1, 3, 3, ci, co). The rules sit BELOW the custom_jvp/vjp AD
# wrappers, so autodiff never differentiates through custom_vmap (its
# reverse-mode hole) — by the time vmap reaches these calls, AD has
# already been routed to the pure-JAX tangent formulations.
# ---------------------------------------------------------------------------

def _lift(p):
    """[B, C] param -> [B, 1, C] for legal per-task blocking."""
    return p.reshape(p.shape[0], 1, p.shape[1]) if p.ndim == 2 else p


def _read_task(ref):
    """Per-task block ref -> the task's tensor in its original shape."""
    v = ref[0]
    if v.ndim == 2 and v.shape[0] == 1:  # lifted 1-D param
        v = v[0]
    return v


def _task_spec(a):
    """BlockSpec selecting task t's slab of a leading-batch array."""
    rank = a.ndim
    zeros = (0,) * (rank - 1)
    return pl.BlockSpec((1,) + a.shape[1:], lambda t, _z=zeros: (t, *_z))


def _bcast_tree(tree, batched, b):
    return jax.tree_util.tree_map(
        lambda p, is_b: p if is_b
        else jnp.broadcast_to(p[None], (b,) + p.shape),
        tree, batched)


# ---------------------------------------------------------------------------
# per-block fused kernels ("block" mode)
#
# Same math as the whole-base kernels, split into one Mosaic program per
# conv-BN-ReLU block (4 fwd + 4 bwd programs instead of 1 + 1). The
# r4s3 on-chip capture showed the whole-base programs OOM-killing the
# remote compile helper at production shapes (N=25/task, meta-batch 32)
# while unit-test shapes compiled in ~minutes each — Mosaic compile cost
# grows superlinearly with program size, and the whole-base backward
# (forward recompute + 4 blocks x 9 taps of dot/pad each) is the largest
# program in the repo. The split keeps the fusion that pays: conv -> BN
# -> ReLU never round-trips HBM (XLA can't fuse across BN's batch-stat
# reduction); only the 4 small block-boundary activations do
# (25 x (14^2 + 7^2 + 4^2 + 2^2) x 64 x 4 B ~ 1.7 MB/task/pass vs the
# ~6 GB/iteration the meta-step moves).
# ---------------------------------------------------------------------------

def _p4(blk):
    return (blk["conv"]["w"], blk["conv"]["b"],
            blk["bn"]["scale"], blk["bn"]["bias"])


def _blk_fwd_kernel(x_ref, w_ref, b_ref, s_ref, be_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    w, b, s, be = (r[...].astype(jnp.float32)
                   for r in (w_ref, b_ref, s_ref, be_ref))
    a, _, _ = _block_fwd(x, w, b, s, be)
    out_ref[...] = a.astype(out_ref.dtype)


def _blk_bwd_kernel(x_ref, w_ref, b_ref, s_ref, be_ref, g_ref,
                    dw_ref, db_ref, ds_ref, dbe_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32)
    w, b, s, be = (r[...].astype(jnp.float32)
                   for r in (w_ref, b_ref, s_ref, be_ref))
    _, xh, inv = _block_fwd(x, w, b, s, be)
    g = g_ref[...].astype(jnp.float32)
    dy, ds, dbe = _block_bwd(g, xh, inv, s, be)
    dw, db, dx = _conv_s2_bwd(x, dy, w)
    for ref, val in zip((dw_ref, db_ref, ds_ref, dbe_ref, dx_ref),
                        (dw, db, ds, dbe, dx)):
        ref[...] = val.astype(ref.dtype)


def _blk_fwd_call_single(p4, x):
    w = p4[0]
    ho, wo = _out_hw(x.shape[1]), _out_hw(x.shape[2])
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _blk_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], ho, wo, w.shape[3]),
                                       x.dtype),
        in_specs=[vspec] * 5,
        out_specs=vspec,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *p4)


def _blk_bwd_call_single(p4, x, g):
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in p4) \
        + (jax.ShapeDtypeStruct(x.shape, x.dtype),)
    return pl.pallas_call(
        _blk_bwd_kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 6,
        out_specs=tuple([vspec] * 5),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, *p4, g)


def _blk_fwd_kernel_batched(x_ref, w_ref, b_ref, s_ref, be_ref, out_ref):
    x = _read_task(x_ref).astype(jnp.float32)
    w, b, s, be = (_read_task(r).astype(jnp.float32)
                   for r in (w_ref, b_ref, s_ref, be_ref))
    a, _, _ = _block_fwd(x, w, b, s, be)
    out_ref[0] = a.astype(out_ref.dtype)


def _blk_bwd_kernel_batched(x_ref, w_ref, b_ref, s_ref, be_ref, g_ref,
                            dw_ref, db_ref, ds_ref, dbe_ref, dx_ref):
    x = _read_task(x_ref).astype(jnp.float32)
    w, b, s, be = (_read_task(r).astype(jnp.float32)
                   for r in (w_ref, b_ref, s_ref, be_ref))
    _, xh, inv = _block_fwd(x, w, b, s, be)
    g = _read_task(g_ref).astype(jnp.float32)
    dy, ds, dbe = _block_bwd(g, xh, inv, s, be)
    dw, db, dx = _conv_s2_bwd(x, dy, w)
    for ref, val in zip((dw_ref, db_ref, ds_ref, dbe_ref, dx_ref),
                        (dw, db, ds, dbe, dx)):
        ref[0] = val.reshape(ref.shape[1:]).astype(ref.dtype)


def _blk_fwd_pallas_batched(p4, x):
    flat = [_lift(p) for p in p4]
    b, n = x.shape[0], x.shape[1]
    ho, wo = _out_hw(x.shape[2]), _out_hw(x.shape[3])
    co = p4[0].shape[-1]
    ins = [x] + flat
    return pl.pallas_call(
        _blk_fwd_kernel_batched,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, n, ho, wo, co), x.dtype),
        in_specs=[_task_spec(a) for a in ins],
        out_specs=pl.BlockSpec((1, n, ho, wo, co),
                               lambda t: (t, 0, 0, 0, 0)),
        compiler_params=_COMPILER_PARAMS_BATCHED,
        interpret=_interpret(),
    )(*ins)


def _blk_bwd_pallas_batched(p4, x, g):
    flat = [_lift(p) for p in p4]
    ins = [x] + flat + [g]
    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in flat) \
        + (jax.ShapeDtypeStruct(x.shape, x.dtype),)
    outs = pl.pallas_call(
        _blk_bwd_kernel_batched,
        grid=(x.shape[0],),
        out_shape=out_shape,
        in_specs=[_task_spec(a) for a in ins],
        out_specs=tuple(_task_spec(o) for o in out_shape),
        compiler_params=_COMPILER_PARAMS_BATCHED,
        interpret=_interpret(),
    )(*ins)
    # un-lift [B, 1, C] param grads back to [B, C]
    return tuple(o.reshape(o.shape[0], -1)
                 if o.ndim == 3 and o.shape[1] == 1 else o for o in outs)


@jax.custom_batching.custom_vmap
def _blk_fwd_batched(p4, x):
    return _blk_fwd_pallas_batched(p4, x)


@_blk_fwd_batched.def_vmap
def _blk_fwd_batched_vmap(axis_size, in_batched, p4, x):
    p_b, x_b = in_batched
    p4 = _bcast_tree(p4, p_b, axis_size)
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    b_inner = x.shape[1]
    merge = lambda p: p.reshape((axis_size * b_inner,) + p.shape[2:])
    out = _blk_fwd_batched(jax.tree_util.tree_map(merge, p4), merge(x))
    return out.reshape((axis_size, b_inner) + out.shape[1:]), True


@jax.custom_batching.custom_vmap
def _blk_fwd(p4, x):
    return _blk_fwd_call_single(p4, x)


@_blk_fwd.def_vmap
def _blk_fwd_vmap(axis_size, in_batched, p4, x):
    p_b, x_b = in_batched
    p4 = _bcast_tree(p4, p_b, axis_size)
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    return _blk_fwd_batched(p4, x), True


@jax.custom_batching.custom_vmap
def _blk_bwd_batched(p4, x, g):
    return _blk_bwd_pallas_batched(p4, x, g)


@_blk_bwd_batched.def_vmap
def _blk_bwd_batched_vmap(axis_size, in_batched, p4, x, g):
    p_b, x_b, g_b = in_batched
    p4 = _bcast_tree(p4, p_b, axis_size)
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    if not g_b:
        g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
    b_inner = x.shape[1]
    merge = lambda p: p.reshape((axis_size * b_inner,) + p.shape[2:])
    outs = _blk_bwd_batched(jax.tree_util.tree_map(merge, p4),
                            merge(x), merge(g))
    split = lambda p: p.reshape((axis_size, b_inner) + p.shape[1:])
    outs = tuple(split(o) for o in outs)
    return outs, tuple(True for _ in outs)


@jax.custom_batching.custom_vmap
def _blk_bwd(p4, x, g):
    return _blk_bwd_call_single(p4, x, g)


@_blk_bwd.def_vmap
def _blk_bwd_vmap(axis_size, in_batched, p4, x, g):
    p_b, x_b, g_b = in_batched
    p4 = _bcast_tree(p4, p_b, axis_size)
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    if not g_b:
        g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
    outs = _blk_bwd_batched(p4, x, g)
    return outs, tuple(True for _ in outs)


def _fwd_call_split(blocks, x):
    """Block-mode base forward: 4 per-block kernels, pooling in XLA.

    Plain traced glue — vmap over tasks reaches the per-block ops'
    custom vmap rules directly; no chain-level rule needed."""
    a = x
    for blk in blocks:
        a = _blk_fwd(_p4(blk), a)
    return jnp.mean(a, axis=(-3, -2))


def _bwd_call_split(blocks, x, g):
    """Block-mode base backward: recompute the forward chain (block
    boundaries round-trip HBM, intra-block stays in VMEM), then walk the
    per-block backward kernels."""
    acts = [x]
    for blk in blocks:
        acts.append(_blk_fwd(_p4(blk), acts[-1]))
    h_last, w_last = acts[-1].shape[-3], acts[-1].shape[-2]
    da = jnp.broadcast_to(
        (g / (h_last * w_last))[..., None, None, :], acts[-1].shape)
    dblocks = [None] * len(blocks)
    for i in reversed(range(len(blocks))):
        dw, db, ds, dbe, da = _blk_bwd(_p4(blocks[i]), acts[i], da)
        dblocks[i] = {"conv": {"w": dw, "b": db},
                      "bn": {"scale": ds, "bias": dbe}}
    return dblocks, da


# ---------------------------------------------------------------------------
# kernel-mode switch
# ---------------------------------------------------------------------------

def set_cnn4_kernel_mode(mode: str | None) -> None:
    """Only "block" (or None) remains. The whole-base twin ("whole" /
    EMT_CNN4_PALLAS=base) was A/B-disqualified on-chip in round 4 —
    compile-server OOM on its backward at every meta-batch plus a 534 s
    forward at production shapes (BASELINE.md stage-11 post-mortem,
    chip_logs/r4s5) — and removed in round 5; it lives in git history
    (commit "Packaging + CI + full-scale vision artifacts" is the last
    to carry it)."""
    if mode not in (None, "block"):
        raise ValueError(
            f"CNN4 kernel mode {mode!r} removed: the whole-base kernels "
            "were A/B-disqualified (BASELINE.md stage-11 post-mortem); "
            "only per-block mode remains")


# ---------------------------------------------------------------------------
# reference (XLA) formulation — double-backward + numerics oracle
# ---------------------------------------------------------------------------

def _pure_base(blocks, x):
    from exploring_meta_tpu.models.cnn4 import base_apply
    a = base_apply(blocks, x, max_pool=False)
    return jnp.mean(a, axis=(1, 2))


def _pure_grads(blocks, x, g):
    _, vjp = jax.vjp(_pure_base, blocks, x)
    db, dx = vjp(g)
    return db, dx


# Both Pallas calls are wrapped in custom_jvp ops (primal = the kernel,
# tangent = forward-mode through the plain-JAX formulation). Why BOTH:
# MAML's meta-gradient is grad-of-grad — the outer jax.grad linearizes
# the graph the inner vjp staged out, and that graph contains the
# residual-producing FORWARD as well as the BACKWARD. Raw pallas_calls
# have no JVP rule ("linearization failed to produce known values"),
# and custom_vjp forbids jvp outright; custom_jvp with an XLA tangent
# keeps the primal fwd/bwd on the fused kernels while the (support-
# batch-only) double-backward runs as a standard XLA HVP — linear in
# the tangents, hence transposable by the outer reverse pass.
@jax.custom_jvp
def _fwd_op(blocks, x):
    return _fwd_call_split(blocks, x)


@_fwd_op.defjvp
def _fwd_op_jvp(primals, tangents):
    primal_out = _fwd_op(*primals)
    _, tangent_out = jax.jvp(_pure_base, primals, tangents)
    return primal_out, tangent_out


@jax.custom_jvp
def _bwd_op(blocks, x, g):
    return _bwd_call_split(blocks, x, g)


@_bwd_op.defjvp
def _bwd_op_jvp(primals, tangents):
    primal_out = _bwd_op(*primals)
    _, tangent_out = jax.jvp(_pure_grads, primals, tangents)
    return primal_out, tangent_out


@jax.custom_vjp
def fused_omni_base(blocks, x):
    """Pooled CNN4-Omniglot base features [N, hidden] for images
    ``x [N, H, W, 1]`` — drop-in for
    ``mean(base_apply(blocks, x, max_pool=False), (1, 2))`` with the
    whole 4-block forward (and its backward) fused into single Pallas
    programs. Exact-math vs the XLA path to f32 rounding; second-order
    differentiable (see module docstring).
    """
    return _fwd_op(blocks, x)


def _fused_fwd(blocks, x):
    return _fwd_op(blocks, x), (blocks, x)


def _fused_bwd(res, g):
    blocks, x = res
    return _bwd_op(*res, g)


fused_omni_base.defvjp(_fused_fwd, _fused_bwd)
