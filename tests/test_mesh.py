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


def test_shard_task_batch_rejects_non_divisible(eight_devices):
    """Friendly ValueError up front — device_put would accept uneven
    shards and fail later with a cryptic shard_map tracing error."""
    import pytest
    mesh = parallel.make_task_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        parallel.shard_task_batch(mesh, jnp.zeros((6, 3)))


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


@pytest.mark.slow
def test_sharded_trpo_meta_matches_single_device(eight_devices):
    """Distributed TRPO outer step == single-device on the same replays."""
    import jax.numpy as jnp
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(16, 16))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                      max_path_length=10)
    trpo_cfg = rl.TRPOConfig(outer_lr=0.1, max_kl=0.05)
    roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)

    key = jax.random.key(1)
    replays, old_stack = [], []
    for i in range(8):
        key, kt, ka = jax.random.split(key, 3)
        task = env.sample_tasks(kt, 1)[0]
        adapted, _, rep, _ = rl.fast_adapt_trpo(policy, params, roll, task,
                                                ka, cfg)
        replays.append(rep)
        old_stack.append(adapted)
    stacked = rl.stack_replays(replays)
    old_params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *old_stack)

    # Evaluate the outer step at a perturbed point: at theta_0 the
    # surrogate/gradient are ~0 by construction and CG directions become
    # f32-noise-dominated, which makes sharded-vs-single comparison
    # meaningless. A shifted theta gives a well-conditioned problem.
    params_eval = jax.tree_util.tree_map(lambda x: x * 1.1 + 0.02, params)

    ref_params, ref_info = rl.meta_optimize_trpo(
        policy, params_eval, old_params, stacked, cfg, trpo_cfg,
        adapt_steps=1)

    mesh = parallel.make_task_mesh(8)
    sh_step = parallel.make_sharded_trpo_meta_step(policy, cfg, trpo_cfg, 1,
                                                   mesh)
    s_old, s_rep = parallel.shard_task_batch(mesh, (old_params, stacked))
    sh_params, sh_info = sh_step(params_eval, s_old, s_rep)

    assert float(ref_info["old_loss"]) == pytest.approx(
        float(sh_info["old_loss"]), rel=1e-4, abs=1e-6)
    assert bool(ref_info["accepted"]) == bool(sh_info["accepted"])
    # CG amplifies f32 reduction-order differences (vmapped-sum vs psum
    # tree) over its iterations; ~1% step-direction divergence is
    # numerics, not semantics (loss/KL/accept all agree above).
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=3e-3)


@pytest.mark.slow
def test_sharded_train_scan_equals_global_step(eight_devices):
    """One step of the fused sharded trainer == the plain global meta_step
    on the concatenation of the per-shard samples (pmean of equal-size
    local means is the global mean)."""
    from exploring_meta_tpu.tasks.sampler import sample_task

    train, _, _ = tasks.load_omniglot(seed=0, synthetic=True,
                                      synthetic_classes=20)
    spec = models.omniglot_spec(ways=5, hidden=8, layers=2)
    params = models.init_cnn4(jax.random.key(0), spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr=0.4, adapt_steps=1,
                                      shots=1, ways=5)
    opt = optax.sgd(0.1)
    mesh = parallel.make_task_mesh(4)
    LOCAL_MB = 2

    def sample_local(key, images):
        keys = jax.random.split(key, LOCAL_MB)
        return jax.vmap(lambda k: sample_task(
            k, images, 5, 1, train.invert, train.rotations))(keys)

    trainer = parallel.make_sharded_train_scan(fa, opt, sample_local,
                                               n_steps=1, mesh=mesh)
    p_sh, _, m_sh = trainer(params, opt.init(params), jax.random.key(7),
                            train.images)
    assert m_sh["loss"].shape == (1,)

    # reproduce the same global batch: the scan splits key(7) into 1 step
    # key, each shard folds in its mesh index
    step_key = jax.random.split(jax.random.key(7), 1)[0]
    batches = [sample_local(jax.random.fold_in(step_key, i), train.images)
               for i in range(4)]
    data = jnp.concatenate([b[0] for b in batches])
    labels = jnp.concatenate([b[1] for b in batches])
    ref_step = adapt.make_meta_step(fa, opt)
    p_ref, _, m_ref = ref_step(params, opt.init(params), data, labels)

    assert float(m_ref["loss"]) == pytest.approx(float(m_sh["loss"][0]),
                                                 rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sharded_trpo_train_scan_equals_unsharded(eight_devices):
    """One fused+sharded MAML-TRPO iteration == plain collection +
    meta_optimize_trpo on the concatenation of the per-shard samples."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(16, 16))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                      max_path_length=10)
    trpo_cfg = rl.TRPOConfig(outer_lr=0.1, max_kl=0.05)
    roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
    mesh = parallel.make_task_mesh(4)
    LOCAL_MB = 2

    train = parallel.make_sharded_trpo_train_scan(
        env, policy, roll, cfg, trpo_cfg, meta_batch_size=8, n_steps=1,
        mesh=mesh)
    p_sh, ms = train(params, jax.random.key(7))
    assert ms["meta_loss"].shape == (1,)

    # Reproduce the same global batch: the scan splits key(7) into 1 step
    # key, each shard folds in its mesh index, then splits task/adapt keys.
    step_key = jax.random.split(jax.random.key(7), 1)[0]
    replays, old_stack, rewards = [], [], []
    for i in range(4):
        k_tasks, k_adapt = jax.random.split(
            jax.random.fold_in(step_key, i))
        tasks_b = env.sample_tasks(k_tasks, LOCAL_MB)
        keys = jax.random.split(k_adapt, LOCAL_MB)
        for j in range(LOCAL_MB):
            task = jax.tree_util.tree_map(lambda x: x[j], tasks_b)
            adapted, _, rep, m = rl.fast_adapt_trpo(policy, params, roll,
                                                    task, keys[j], cfg)
            replays.append(rep)
            old_stack.append(adapted)
            rewards.append(float(jnp.mean(m["reward"])))
    stacked = rl.stack_replays(replays)
    old_params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                        *old_stack)
    ref_params, ref_info = rl.meta_optimize_trpo(policy, params, old_params,
                                                 stacked, cfg, trpo_cfg,
                                                 adapt_steps=1)

    assert float(ref_info["old_loss"]) == pytest.approx(
        float(ms["meta_loss"][0]), rel=1e-4, abs=1e-6)
    assert float(ms["adapt_reward"][0]) == pytest.approx(
        float(np.mean(rewards)), rel=1e-4)
    # CG amplifies f32 reduction-order differences (see the sharded
    # meta-step test above); loss/reward agreement above is the semantics.
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=3e-3)


@pytest.mark.slow
def test_sharded_adam_train_scan_equals_global(eight_devices):
    """One fused+sharded PPO meta-iteration == one global Adam step on the
    concatenated shard samples (pmean of equal-size local grads)."""
    import optax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(16, 16))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                      max_path_length=10, ppo_epochs=2)
    roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
    opt = optax.adam(1e-3)
    mesh = parallel.make_task_mesh(4)
    LOCAL_MB = 2

    train = parallel.make_sharded_adam_train_scan(
        env, policy, roll, cfg, opt, "ppo", meta_batch_size=8, n_steps=1,
        mesh=mesh)
    p_sh, _, ms = train(params, opt.init(params), jax.random.key(9))
    assert ms["meta_loss"].shape == (1,)

    step_key = jax.random.split(jax.random.key(9), 1)[0]
    all_tasks, all_keys = [], []
    for i in range(4):
        k_tasks, k_adapt = jax.random.split(
            jax.random.fold_in(step_key, i))
        all_tasks.append(env.sample_tasks(k_tasks, LOCAL_MB))
        all_keys.append(jax.random.split(k_adapt, LOCAL_MB))
    tasks_b = jnp.concatenate(all_tasks)
    keys = jnp.concatenate(all_keys)

    def batch_loss(p):
        def task_loss(task, k):
            _, loss, _ = rl.fast_adapt_ppo(policy, p, roll, task, k, cfg)
            return loss
        return jnp.mean(jax.vmap(task_loss)(tasks_b, keys))

    loss, grads = jax.value_and_grad(batch_loss)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    # The PPO query loss value is ~0 by construction (ratio == 1 ->
    # masked mean of normalized advantages), so compare it absolutely;
    # the meaningful equality is the gradient step below.
    assert float(loss) == pytest.approx(float(ms["meta_loss"][0]), abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_vision_trainer_mesh_plus_fuse(tmp_path, monkeypatch,
                                       eight_devices):
    """--mesh 4 --fuse 2: multi-chip sharded iterations fused under scan,
    metrics contract preserved."""
    monkeypatch.chdir(tmp_path)
    from exploring_meta_tpu.trainers import VisionTrainer
    from exploring_meta_tpu.utils.config import VisionConfig

    cfg = VisionConfig(dataset="omni", num_iterations=4, meta_batch_size=8,
                       save_every=3, synthetic=True, mesh=4, fuse=2)
    t = VisionTrainer(cfg, anil=False)
    acc = t.run()
    for key in ("train_loss", "train_acc", "valid_loss", "valid_acc"):
        assert len(t.metrics[key]) == 4
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_sharded_replay_meta_step_matches_single_device(eight_devices):
    """Mesh Adam outer step over recorded replays == single-device
    value_and_grad + update on the same replays."""
    import optax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(16, 16))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                      max_path_length=10, ppo_epochs=2)
    roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)

    key = jax.random.key(2)
    replays = []
    for i in range(8):
        key, kt, kc = jax.random.split(key, 3)
        task = env.sample_tasks(kt, 1)[0]
        stacked, _ = rl.collect_replays("ppo", policy, params, roll, task,
                                        kc, cfg)
        replays.append(stacked)
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *replays)

    opt = optax.adam(1e-3)
    meta_loss = rl.make_replay_meta_loss("ppo", policy, cfg)
    loss_ref, grads = jax.value_and_grad(meta_loss)(params, batched)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    mesh = parallel.make_task_mesh(8)
    step = parallel.make_sharded_replay_meta_step(policy, cfg, "ppo", opt,
                                                  mesh)
    s_rep = parallel.shard_task_batch(mesh, batched)
    p_sh, _, loss_sh = step(params, opt.init(params), s_rep)

    assert float(loss_ref) == pytest.approx(float(loss_sh), abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_rl_trainer_mesh_nonfused_adam(tmp_path, eight_devices):
    """--mesh 4 without --fuse on a device-env PPO run: the outer step is
    mesh-sharded (previously --mesh was silently ignored here)."""
    from exploring_meta_tpu.trainers.rl import RLTrainer
    from exploring_meta_tpu.utils.config import RLScriptConfig

    cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=3,
                         meta_batch_size=4, adapt_batch_size=2,
                         max_path_length=10, save_every=2, n_eval_tasks=2,
                         seed=0, mesh=4)
    trainer = RLTrainer(cfg, algo="ppo", path=str(tmp_path) + "/")
    final = trainer.run()
    assert np.isfinite(final["mean_reward"])
    assert len(trainer.metrics["meta_loss"]) == 3


def test_make_task_mesh_rejects_oversized_request(eight_devices):
    """--mesh larger than the machine must error, not silently truncate
    (which would shrink the fused path's effective meta-batch)."""
    with pytest.raises(ValueError, match="devices are available"):
        parallel.make_task_mesh(len(jax.devices()) + 1)


@pytest.mark.slow
def test_sharded_scans_accept_bf16_policy(eight_devices):
    """RL --bf16 composes with --mesh/--fuse: the policy spec's
    compute_dtype flows through the sharded fused scans (policies carry
    the flag, so every path that takes `policy` inherits it)."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy
    import optax

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(16, 16),
                              compute_dtype="bf16")
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                      max_path_length=5)
    trpo_cfg = rl.TRPOConfig(outer_lr=0.1, max_kl=0.05)
    roll = rl.make_rollout(env, policy.sample, episodes=2, horizon=5)
    mesh = parallel.make_task_mesh(4)

    fused = parallel.make_sharded_trpo_train_scan(
        env, policy, roll, cfg, trpo_cfg, meta_batch_size=8, n_steps=1,
        mesh=mesh)
    p1, ms = fused(params, jax.random.key(1))
    assert np.isfinite(float(ms["meta_loss"][0]))
    # master params stay f32 (mixed-precision contract)
    for leaf in jax.tree_util.tree_leaves(p1):
        assert leaf.dtype == jnp.float32

    opt = optax.adam(1e-3)
    afused = parallel.make_sharded_adam_train_scan(
        env, policy, roll, cfg, opt, "ppo", meta_batch_size=8, n_steps=1,
        mesh=mesh)
    p2, _, ms2 = afused(params, opt.init(params), jax.random.key(2))
    assert np.isfinite(float(ms2["meta_loss"][0]))
    for leaf in jax.tree_util.tree_leaves(p2):
        assert leaf.dtype == jnp.float32
