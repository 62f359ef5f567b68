"""TPU-only Pallas tests (the rollout kernel's PRNG has no interpreter
support; these run when pytest executes on a real TPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if jax.default_backend() == "cpu":
    pytest.skip("fused rollout kernel needs a TPU backend",
                allow_module_level=True)

from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy
from exploring_meta_tpu.pallas import make_fused_particles2d_rollout


def test_fused_rollout_replay_parity():
    """Replaying recorded actions through the pure-JAX env must reproduce
    rewards/states/dones exactly."""
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    params = policy.init(jax.random.key(0))
    env = Particles2D()
    task = env.sample_tasks(jax.random.key(1), 1)[0]
    roll = make_fused_particles2d_rollout(policy, episodes=8, horizon=30)
    tr = roll(params, task, jax.random.key(2))

    state, _ = jax.vmap(lambda k: env.reset(k, task))(
        jax.random.split(jax.random.key(9), 8))
    for t in range(30):
        state, obs2, rew, done, suc = jax.vmap(
            lambda st, aa: env.step(st, aa, task))(state, tr.action[t])
        np.testing.assert_allclose(
            np.asarray(rew) * np.asarray(tr.valid[t]),
            np.asarray(tr.reward[t]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(obs2),
                                   np.asarray(tr.next_state[t]), atol=2e-5)


def test_fused_rollout_vmap_with_per_task_params():
    from exploring_meta_tpu import rl
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    params = policy.init(jax.random.key(0))
    env = Particles2D()
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=8,
                      max_path_length=20)
    roll = make_fused_particles2d_rollout(policy, episodes=8, horizon=20)
    tasks_b = env.sample_tasks(jax.random.key(3), 4)

    @jax.jit
    def collect(p, tb, keys):
        def per_task(t, k):
            _, loss, _, m = rl.fast_adapt_trpo(policy, p, roll, t, k, cfg)
            return loss, m["reward"]
        return jax.vmap(per_task)(tb, keys)

    loss, rew = collect(params, tasks_b,
                        jax.random.split(jax.random.key(4), 4))
    assert np.isfinite(np.asarray(loss)).all()
    assert loss.shape == (4,)


@pytest.fixture(params=["whole", "block"])
def cnn4_kernel_mode(request):
    from exploring_meta_tpu.pallas.cnn4_pallas import set_cnn4_kernel_mode
    set_cnn4_kernel_mode(request.param)
    try:
        yield request.param
    finally:
        set_cnn4_kernel_mode(None)


def test_fused_cnn4_base_on_chip(cnn4_kernel_mode):
    """Fused CNN4 kernels (pallas/cnn4_pallas.py) compiled on the real
    chip in BOTH modes (whole-base programs vs per-block programs):
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


def test_fused_rollout_per_task_sigma_lanes():
    """Regression for the task-major lane expansion of per-task sigma:
    task 0 runs with a collapsed sigma (deterministic: action == policy
    mean) while task 1 keeps sigma = 1 — under vmap over tasks, EVERY
    lane of task 0 must be noise-free and task 1's must not be. The old
    pltpu.repeat (tile) expansion gave lane l task (l mod B)'s sigma."""
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    base = policy.init(jax.random.key(0))
    p0 = dict(base, sigma=jnp.full_like(base["sigma"], -40.0))  # collapsed
    p1 = dict(base, sigma=jnp.zeros_like(base["sigma"]))        # sigma = 1
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), p0, p1)

    E, H = 8, 10
    roll = make_fused_particles2d_rollout(policy, episodes=E, horizon=H)
    tasks = jnp.array([[0.3, 0.2], [-0.4, 0.1]])
    keys = jax.random.split(jax.random.key(5), 2)
    tr = jax.vmap(roll)(stacked, tasks, keys)

    # replay the recorded states through the policy mean per task
    def mean_actions(params, states):
        return jax.vmap(lambda s: policy.density(params, s)[0])(states)

    loc0 = mean_actions(p0, tr.state[0])   # [T, E, 2]
    dev0 = np.max(np.abs(np.asarray(tr.action[0] - loc0)))
    loc1 = mean_actions(p1, tr.state[1])
    dev1 = np.max(np.abs(np.asarray(tr.action[1] - loc1)))
    assert dev0 < 1e-5, f"task 0 (collapsed sigma) sampled noise: {dev0}"
    assert dev1 > 0.05, f"task 1 (sigma=1) shows no sampling noise: {dev1}"
