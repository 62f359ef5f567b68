"""Multi-device task-DP tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from exploring_meta_tpu import adapt, models, parallel, tasks


def _setup(meta_batch):
    train, _, _ = tasks.load_omniglot(seed=0, synthetic=True,
                                      synthetic_classes=20)
    spec = models.omniglot_spec(ways=5, hidden=8, layers=2)
    params = models.init_cnn4(jax.random.key(0), spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr=0.4, adapt_steps=1,
                                      shots=1, ways=5)
    data, labels = tasks.sample_task_batch(jax.random.key(3), train, 5, 1,
                                           meta_batch)
    return params, fa, data, labels


def test_sharded_meta_step_matches_single_device(eight_devices):
    params, fa, data, labels = _setup(meta_batch=8)
    opt = optax.sgd(0.1)

    ref_step = adapt.make_meta_step(fa, opt)
    p_ref, _, m_ref = ref_step(params, opt.init(params), data, labels)

    mesh = parallel.make_task_mesh(8)
    sh_step = parallel.make_sharded_meta_step(fa, opt, mesh)
    sdata, slabels = parallel.shard_task_batch(mesh, (data, labels))
    p_sh, _, m_sh = sh_step(params, opt.init(params), sdata, slabels)

    assert float(m_ref["loss"]) == pytest.approx(float(m_sh["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_step_runs_on_subset_mesh(eight_devices):
    params, fa, data, labels = _setup(meta_batch=4)
    opt = optax.adam(1e-3)
    mesh = parallel.make_task_mesh(4)
    step = parallel.make_sharded_meta_step(fa, opt, mesh)
    sdata, slabels = parallel.shard_task_batch(mesh, (data, labels))
    p, s, m = step(params, opt.init(params), sdata, slabels)
    assert np.isfinite(float(m["loss"]))


import pytest  # noqa: E402
