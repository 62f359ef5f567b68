"""TPU-only Pallas tests: real-Mosaic compilation + parity of the
per-block fused CNN4 kernels (CPU interpret mode proves the math in
tests/test_pallas_cnn4.py; this proves the chip). Run with
EMT_TEST_TPU=1 on the real backend — and run it ALONE, the tunnel is
slow and most of the wall is Mosaic compile time."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if jax.default_backend() == "cpu":
    pytest.skip("needs a real TPU backend (Mosaic compile)",
                allow_module_level=True)


@pytest.fixture(params=["block"])
def cnn4_kernel_mode(request):
    from exploring_meta_tpu.pallas.cnn4_pallas import set_cnn4_kernel_mode
    set_cnn4_kernel_mode(request.param)
    try:
        yield request.param
    finally:
        set_cnn4_kernel_mode(None)


def test_fused_cnn4_base_on_chip(cnn4_kernel_mode):
    """Fused CNN4 kernels (pallas/cnn4_pallas.py) compiled on the real
    chip (per-block programs; the whole-base twin is removed):
    forward + first-order grads + vmapped-over-tasks second-order
    meta-grads must match the XLA path. The CPU interpret run
    (tests/test_pallas_cnn4.py) proves the math; this proves Mosaic
    compiles the parity-decomposed taps and the multi-output backward."""
    from exploring_meta_tpu import models
    from exploring_meta_tpu.models.cnn4 import base_apply, omniglot_spec
    from exploring_meta_tpu.ops.losses import cross_entropy
    from exploring_meta_tpu.pallas.cnn4_pallas import fused_omni_base

    spec = omniglot_spec(ways=5)
    params = models.init_cnn4(jax.random.key(0), spec)
    x = jax.random.normal(jax.random.key(1), (10, 28, 28, 1), jnp.float32)
    y = jnp.arange(10) % 5

    def pure_feats(blocks, xx):
        return jnp.mean(base_apply(blocks, xx, max_pool=False), axis=(1, 2))

    got = jax.jit(fused_omni_base)(params["base"], x)
    want = jax.jit(pure_feats)(params["base"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def meta_loss(p, feats_fn):
        def task_loss(pp):
            feats = feats_fn(pp["base"], x)
            logits = feats @ pp["head"]["w"] + pp["head"]["b"]
            return cross_entropy(logits, y)
        g = jax.grad(task_loss)(p)
        # inner_lr 0.05: at 0.5 the f32 meta-grad through batch-stat BN
        # is ill-conditioned (pure XLA differs from itself by 1.6e-2
        # across CPU backend configs; see test_pallas_cnn4.py) — any
        # f32-vs-f32 comparison there chases reduction-order noise.
        adapted = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g)
        return task_loss(adapted)

    g_pal = jax.jit(jax.grad(meta_loss), static_argnums=1)(
        params, fused_omni_base)
    g_xla = jax.jit(jax.grad(meta_loss), static_argnums=1)(
        params, pure_feats)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)

    # vmap over tasks with per-task (adapted) params — the meta-step shape
    xb = jax.random.normal(jax.random.key(2), (4, 8, 28, 28, 1))
    pb = jax.tree_util.tree_map(
        lambda p: jnp.stack([p, p * 1.01, p * 0.99, p * 1.02]),
        params["base"])
    got = jax.jit(jax.vmap(fused_omni_base))(pb, xb)
    want = jax.jit(jax.vmap(pure_feats))(pb, xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
