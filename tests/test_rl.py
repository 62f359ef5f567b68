"""RL substrate tests: rollouts, advantage pipeline, fast-adapt, TRPO meta."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import rl
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy, DiagNormalPolicyANIL


@pytest.fixture(scope="module")
def setup():
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(32, 32))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, gamma=0.99, tau=1.0, adapt_steps=1,
                      adapt_batch_size=8, max_path_length=20)
    roll = rl.make_rollout(env, policy.sample, episodes=cfg.adapt_batch_size,
                           horizon=cfg.max_path_length)
    task = env.sample_tasks(jax.random.key(1), 1)[0]
    return env, policy, params, cfg, roll, task


class TestRollout:
    def test_shapes(self, setup):
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(2))
        T, E = cfg.max_path_length, cfg.adapt_batch_size
        assert traj.state.shape == (T, E, 2)
        assert traj.action.shape == (T, E, 2)
        assert traj.reward.shape == (T, E)
        assert traj.valid.shape == (T, E)

    def test_horizon_done(self, setup):
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(2))
        # last valid step of every episode must be terminal
        last = np.asarray(traj.done[-1])
        valid_last = np.asarray(traj.valid[-1])
        assert np.all(last[valid_last > 0] == 1.0)

    def test_reward_is_negative_distance(self, setup):
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(3))
        d = np.linalg.norm(np.asarray(traj.next_state[0, 0]) - np.asarray(task))
        assert float(traj.reward[0, 0]) == pytest.approx(-d, rel=1e-5)

    def test_no_grad_leak_through_actions(self, setup):
        """Meta-gradient must not include a reparameterization path."""
        env, policy, params, cfg, roll, task = setup

        def mean_reward(p):
            traj = roll(p, task, jax.random.key(4))
            return jnp.mean(traj.reward)

        g = jax.grad(mean_reward)(params)
        # reward depends on params ONLY through stop-gradiented actions
        assert max(np.abs(np.asarray(l)).max()
                   for l in jax.tree_util.tree_leaves(g)) == 0.0

    def test_timestep_and_validity(self, setup):
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(5))
        np.testing.assert_array_equal(
            np.asarray(traj.timestep[:, 0]),
            np.arange(cfg.max_path_length))

    def test_episode_success_steps(self, setup):
        """First-success index per episode, -1 when never successful —
        the reference's get_success_per_ep (rl.py:75-92) with its
        None-for-no-success encoded as -1."""
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(7))
        T, E = traj.success.shape
        success = np.zeros((T, E), np.float32)
        success[3, 0] = 1.0
        success[5, 0] = 1.0   # later hit must not override the first
        if E > 1:
            success[0, 1] = 1.0
        traj = traj._replace(success=jnp.asarray(success),
                             valid=jnp.ones_like(traj.valid))
        steps = np.asarray(traj.episode_success_steps())
        assert steps[0] == 3
        if E > 1:
            assert steps[1] == 0
            assert (steps[2:] == -1).all()
        successes = np.asarray(traj.episode_successes())
        np.testing.assert_array_equal(steps >= 0, successes > 0)


class TestAdvantages:
    def test_advantages_finite_and_reasonable(self, setup):
        env, policy, params, cfg, roll, task = setup
        traj = roll(params, task, jax.random.key(6))
        adv, w = rl.traj_advantages(traj, cfg)
        assert np.isfinite(np.asarray(adv)).all()
        assert adv.shape == traj.reward.shape

    def test_masked_normalize_matches_unmasked_on_full_mask(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        mask = jnp.ones((7, 3))
        got = rl.masked_normalize(x, mask)
        expected = (np.asarray(x) - np.asarray(x).mean()) / (
            np.asarray(x).std(ddof=1) + 1e-8)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4)

    def test_masked_normalize_ignores_invalid(self):
        x = jnp.array([[1.0], [2.0], [100.0]])
        mask = jnp.array([[1.0], [1.0], [0.0]])
        got = np.asarray(rl.masked_normalize(x, mask))
        # stats from [1, 2] only: mean 1.5, std ~0.707
        assert got[0, 0] == pytest.approx(-0.7071, rel=1e-3)


class TestFastAdapt:
    def test_vpg_adapt_changes_params(self, setup):
        env, policy, params, cfg, roll, task = setup
        adapted, loss, m = rl.fast_adapt_vpg(policy, params, roll, task,
                                             jax.random.key(7), cfg)
        assert np.isfinite(float(loss))
        diffs = jax.tree_util.tree_map(
            lambda a, b: np.abs(np.asarray(a - b)).max(), adapted, params)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    @pytest.mark.slow
    def test_ppo_meta_gradient_nonzero(self, setup):
        env, policy, params, cfg, roll, task = setup

        def meta_loss(p):
            _, loss, _ = rl.fast_adapt_ppo(policy, p, roll, task,
                                           jax.random.key(8), cfg)
            return loss

        g = jax.grad(meta_loss)(params)
        total = sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_anil_inner_freezes_body(self, setup):
        env, _, _, cfg, _, task = setup
        policy = DiagNormalPolicyANIL(input_size=2, output_size=2,
                                      fc_neurons=100)
        params = policy.init(jax.random.key(0))
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        acfg = cfg._replace(anil=True, adapt_batch_size=4, max_path_length=10)
        adapted, loss, m = rl.fast_adapt_vpg(policy, params, roll, task,
                                             jax.random.key(9), acfg)
        for a, b in zip(jax.tree_util.tree_leaves(adapted["body"]),
                        jax.tree_util.tree_leaves(params["body"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(adapted["head"]["w"] -
                                 params["head"]["w"])).max() > 0

    def test_trpo_fast_adapt_returns_replay(self, setup):
        env, policy, params, cfg, roll, task = setup
        adapted, loss, replay, m = rl.fast_adapt_trpo(
            policy, params, roll, task, jax.random.key(10), cfg)
        assert len(replay) == cfg.adapt_steps + 1
        assert np.isfinite(float(loss))


@pytest.mark.slow
class TestTRPOMeta:
    def _collect(self, env, policy, params, cfg, roll, key, n_tasks):
        """Jitted vmapped collection (one XLA program, not n eager
        fast_adapt dispatches — keeps this test's wall-clock down)."""
        collect = rl.make_trpo_collect(policy, roll, cfg)
        k1, k2 = jax.random.split(key)
        tasks_batch = env.sample_tasks(k1, n_tasks)
        keys = jax.random.split(k2, n_tasks)
        adapted, _, stacked, _ = collect(params, tasks_batch, keys)
        return adapted, stacked

    def test_meta_optimize_improves_surrogate(self, setup):
        env, policy, params, cfg, roll, task = setup
        old_params, stacked = self._collect(env, policy, params, cfg, roll,
                                            jax.random.key(11), 3)
        trpo_cfg = rl.TRPOConfig(outer_lr=0.05, max_kl=0.05)
        meta_step = rl.make_trpo_meta_step(policy, cfg, trpo_cfg,
                                           adapt_steps=cfg.adapt_steps)
        new_params, info = meta_step(params, old_params, stacked)

        assert np.isfinite(float(info["old_loss"]))
        if bool(info["accepted"]):
            new_loss, kl = jax.jit(rl.meta_surrogate_loss,
                                   static_argnums=(0, 4, 5))(
                policy, new_params, old_params, stacked, cfg,
                cfg.adapt_steps)
            assert float(new_loss) < float(info["old_loss"])
            assert float(kl) < trpo_cfg.max_kl

    def test_surrogate_at_current_params_near_baseline(self, setup):
        """At theta = theta_old-pre-adaptation, the re-derived policies
        equal the stored ones, so KL ~ 0."""
        env, policy, params, cfg, roll, task = setup
        old_params, stacked = self._collect(env, policy, params, cfg, roll,
                                            jax.random.key(12), 1)
        # re-derive from the SAME pre-adaptation params the replay used
        loss, kl = jax.jit(rl.meta_surrogate_loss, static_argnums=(0, 4, 5))(
            policy, params, old_params, stacked, cfg, cfg.adapt_steps)
        # First-order (collection) vs second-order (re-run) inner updates
        # produce the same VALUES, so KL(new||old) should be ~0.
        assert float(kl) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
class TestEndToEndRL:
    def test_maml_trpo_learns_particles2d(self):
        """Meta-train MAML-TRPO a few iterations; post-adaptation reward on
        fresh tasks must improve over the initial policy."""
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(64, 64))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.05, gamma=0.99, tau=1.0, adapt_steps=1,
                          adapt_batch_size=8, max_path_length=20)
        trpo_cfg = rl.TRPOConfig(outer_lr=0.5, max_kl=0.05)
        roll = rl.make_rollout(env, policy.sample, episodes=8, horizon=20)
        meta_step = rl.make_trpo_meta_step(policy, cfg, trpo_cfg,
                                           adapt_steps=1)

        key = jax.random.key(1)
        before = rl.evaluate("trpo", policy, params, env, roll, cfg,
                             n_tasks=10, key=jax.random.key(99))

        # vmapped collection, as the trainer does (trainers/rl.py
        # _make_trpo_iteration) — one XLA program per iteration
        # instead of 8 eager fast_adapt dispatches.
        collect = rl.make_trpo_collect(policy, roll, cfg)

        for it in range(5):
            key, tk, ak = jax.random.split(key, 3)
            tasks_batch = env.sample_tasks(tk, 8)
            keys = jax.random.split(ak, 8)
            old_params, _, stacked, _ = collect(params, tasks_batch, keys)
            params, info = meta_step(params, old_params, stacked)

        after = rl.evaluate("trpo", policy, params, env, roll, cfg,
                            n_tasks=10, key=jax.random.key(99))
        assert after["mean_reward"] > before["mean_reward"]

    def test_maml_ppo_learns_particles2d(self):
        import optax
        from exploring_meta_tpu import adapt as adapt_mod

        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(64, 64))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.05, gamma=0.99, tau=1.0, adapt_steps=1,
                          adapt_batch_size=8, max_path_length=20,
                          ppo_epochs=2, ppo_clip_ratio=0.3)
        roll = rl.make_rollout(env, policy.sample, episodes=8, horizon=20)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def meta_step(params, opt_state, tasks_batch, keys):
            def task_loss(p, t, k):
                _, loss, m = rl.fast_adapt_ppo(policy, p, roll, t, k, cfg)
                return loss, m["reward"]

            def batch_loss(p):
                losses, rews = jax.vmap(lambda t, k: task_loss(p, t, k))(
                    tasks_batch, keys)
                return jnp.mean(losses), jnp.mean(rews)

            (loss, rew), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rew

        key = jax.random.key(1)
        before = rl.evaluate("ppo", policy, params, env, roll, cfg,
                             n_tasks=10, key=jax.random.key(7))
        for it in range(8):
            key, tk, kk = jax.random.split(key, 3)
            tb = env.sample_tasks(tk, 8)
            params, opt_state, rew = meta_step(params, opt_state, tb,
                                               jax.random.split(kk, 8))
        after = rl.evaluate("ppo", policy, params, env, roll, cfg,
                            n_tasks=10, key=jax.random.key(7))
        assert after["mean_reward"] > before["mean_reward"]


def test_evaluate_each3_rejects_device_envs():
    """each3/explicit-task selection needs dict tasks; device envs must
    get a clear error instead of a t['task'] TypeError."""
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(8, 8))
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(adapt_steps=1, adapt_batch_size=2, max_path_length=4)
    roll = rl.make_rollout(env, policy.sample, episodes=2, horizon=4)
    with pytest.raises(ValueError, match="dict tasks"):
        rl.evaluate("vpg", policy, params, env, roll, cfg, n_tasks=2,
                    key=jax.random.key(1), device_env=True, each3=True)
    with pytest.raises(ValueError, match="dict tasks"):
        rl.evaluate("vpg", policy, params, env, roll, cfg,
                    n_tasks="door-close", key=jax.random.key(1),
                    device_env=True)


class TestAdaptRLFixes:
    def _setup(self, episodes=3, horizon=8):
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(8, 8))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1,
                          adapt_batch_size=episodes,
                          max_path_length=horizon)
        roll = rl.make_rollout(env, policy.sample, episodes=episodes,
                               horizon=horizon)
        return env, policy, params, cfg, roll

    @pytest.mark.slow
    def test_dice_recurrence_is_per_episode(self):
        """The DiCE cumsum must chain log-probs within an episode (time
        axis), never across the episode axis — oracle: per-episode
        weighted cumsum computed column by column."""
        from exploring_meta_tpu.ops.losses import magic_box
        from exploring_meta_tpu.rl.adapt_rl import (
            _log_prob, masked_mean, masked_normalize, traj_advantages,
        )
        env, policy, params, cfg, roll = self._setup()
        task = env.sample_tasks(jax.random.key(1), 1)[0]
        traj = roll(params, task, jax.random.key(2))
        T, E = traj.reward.shape

        got = float(rl.vpg_a2c_loss(policy, params, traj, cfg, dice=True))

        # oracle: independent recurrence per episode column
        lp = np.asarray(_log_prob(policy, params, traj, False)).reshape(T, E)
        dones = np.asarray(traj.done * traj.valid)
        n_eps = max(dones.sum(), 1.0)
        cum = np.zeros_like(lp)
        for e in range(E):
            y = 0.0
            for t in range(T):
                w = (1.0 if t == 0 else 1.0 - dones[t - 1, e]) / n_eps
                y = lp[t, e] + w * y
                cum[t, e] = y
        boxed = np.asarray(magic_box(jnp.asarray(cum))).reshape(T * E, 1)
        # vpg_a2c_loss uses RAW advantages (reference rl.py:208-226 never
        # normalizes despite its comment)
        adv, _ = traj_advantages(traj, cfg)
        adv = np.asarray(traj.flat(adv))[:, None]
        valid = np.asarray(traj.flat(traj.valid))[:, None]
        ref = -float((boxed * adv * valid).sum() / valid.sum())
        assert got == pytest.approx(ref, rel=1e-4)

        # the gradient must also match the per-episode oracle: compare
        # against a loss built from the column-wise recurrence under AD
        def oracle_loss(p):
            lp_ = _log_prob(policy, p, traj, False).reshape(T, E)
            cols = []
            for e in range(E):
                w = jnp.concatenate([jnp.ones((1,)),
                                     1.0 - dones[:-1, e]]) / n_eps
                y, out = 0.0, []
                for t in range(T):
                    y = lp_[t, e] + w[t] * y
                    out.append(y)
                cols.append(jnp.stack(out))
            boxed_ = magic_box(jnp.stack(cols, axis=1)).reshape(T * E, 1)
            a = jnp.asarray(adv)
            v = jnp.asarray(valid)
            return -jnp.sum(boxed_ * a * v) / jnp.sum(v)

        g_ref = jax.grad(oracle_loss)(params)
        g_got = jax.grad(lambda p: rl.vpg_a2c_loss(policy, p, traj, cfg,
                                                   dice=True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_trpo_query_loss_reuses_support_baseline(self):
        """fast_adapt_trpo's valid_loss must use the LAST support-fitted
        value baseline (reference update_vf=False semantics), not refit
        on the query trajectory."""
        from exploring_meta_tpu.rl.adapt_rl import (
            traj_advantages, trpo_a2c_loss,
        )
        env, policy, params, cfg, roll = self._setup()
        task = env.sample_tasks(jax.random.key(3), 1)[0]
        adapted, valid_loss, replay, _ = rl.fast_adapt_trpo(
            policy, params, roll, task, jax.random.key(4), cfg)
        support, query = replay[0], replay[-1]
        _, w_support = traj_advantages(support, cfg)
        ref = float(trpo_a2c_loss(policy, adapted, query, cfg,
                                  update_vf=False, baseline_w=w_support))
        refit = float(trpo_a2c_loss(policy, adapted, query, cfg))
        assert float(valid_loss) == pytest.approx(ref, rel=1e-5)
        # and the two semantics genuinely differ on this data
        assert ref != pytest.approx(refit, rel=1e-5)

    def test_replay_meta_loss_rejects_unknown_algo(self):
        from exploring_meta_tpu.models import DiagNormalPolicy as P
        policy = P(input_size=2, output_size=2, hiddens=(8, 8))
        cfg = rl.RLConfig()
        with pytest.raises(ValueError, match="unsupported algo"):
            rl.make_replay_meta_loss("trpo", policy, cfg)


@pytest.mark.slow
class TestRLResume:
    """True mid-training resume for the RL trainers (VisionTrainer parity):
    checkpoints carry params + optimizer state + RNG + iteration, and a
    resumed run reproduces the uninterrupted run's post-resume metrics."""

    def _cfg(self, **kw):
        from exploring_meta_tpu.utils.config import RLScriptConfig
        base = dict(env="Particles2D-v1", num_iterations=4,
                    meta_batch_size=2, adapt_batch_size=2,
                    max_path_length=5, save_every=2, n_eval_tasks=2,
                    inner_lr=0.05, outer_lr=3e-3, seed=11)
        base.update(kw)
        return RLScriptConfig(**base)

    def _run(self, cfg, algo="ppo", tmp=None):
        from exploring_meta_tpu.trainers.rl import RLTrainer
        t = RLTrainer(cfg, algo, path=str(tmp) + "/")
        t.run()
        return t

    def test_ppo_resume_bit_consistent(self, tmp_path):
        import glob
        import os
        full = self._run(self._cfg(), "ppo", tmp_path / "full")
        ckpt = sorted(glob.glob(os.path.join(
            full.model_path, "model_checkpoints", "*.npz")),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]))[-1]
        assert ckpt.endswith("model_2.npz")
        # checkpoint written after iteration 2 -> resumed run trains
        # iteration 3 only, reproducing the uninterrupted run bit-for-bit
        # (same params, same Adam moments, same RNG stream)
        res = self._run(self._cfg(resume=ckpt, save_every=100), "ppo",
                        tmp_path / "resumed")
        assert len(res.metrics["meta_loss"]) == 1
        np.testing.assert_allclose(res.metrics["meta_loss"][0],
                                   full.metrics["meta_loss"][3],
                                   rtol=1e-5)
        np.testing.assert_allclose(res.metrics["adapt_reward"][0],
                                   full.metrics["adapt_reward"][3],
                                   rtol=1e-5)

    def test_ppo_fused_resume_bit_consistent(self, tmp_path):
        import glob
        import os
        full = self._run(self._cfg(fuse=2), "ppo", tmp_path / "full")
        ckpts = sorted(glob.glob(os.path.join(
            full.model_path, "model_checkpoints", "*.npz")),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]))
        # fused checkpoints land on chunk-end iterations (iteration 1
        # after the first 2-iteration chunk)
        first = ckpts[0]
        assert first.endswith("model_1.npz")
        res = self._run(self._cfg(resume=first, fuse=2, save_every=100),
                        "ppo", tmp_path / "resumed")
        assert len(res.metrics["meta_loss"]) == 2
        np.testing.assert_allclose(res.metrics["meta_loss"],
                                   full.metrics["meta_loss"][2:4],
                                   rtol=1e-5)

    def test_trpo_resume_continues_iteration_count(self, tmp_path):
        import glob
        import os
        full = self._run(self._cfg(outer_lr=0.3), "trpo", tmp_path / "full")
        ckpt = sorted(glob.glob(os.path.join(
            full.model_path, "model_checkpoints", "*.npz")),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]))[-1]
        res = self._run(self._cfg(outer_lr=0.3, resume=ckpt,
                                  save_every=100), "trpo",
                        tmp_path / "resumed")
        # TRPO is stateless in the outer step: params + RNG + iteration
        # restore; the resumed run reproduces iteration 3.
        assert len(res.metrics["meta_loss"]) == 1
        np.testing.assert_allclose(res.metrics["meta_loss"][0],
                                   full.metrics["meta_loss"][3],
                                   rtol=1e-5)


class TestSingleAdaptStepSemantics:
    """The reference is asymmetric about PPO inner updates: the
    analysis-side single_ppo_update is ONE clipped update (rl.py:319-336)
    while training/eval fast_adapt_ppo runs ppo_epochs of them
    (rl.py:264-316). single_adapt_step mirrors that via its ppo_epochs
    parameter (default 1 = analysis semantics)."""

    def _setup(self):
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=env.obs_size,
                                  output_size=env.action_size)
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(adapt_batch_size=4, max_path_length=10,
                          ppo_epochs=3)
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        task = env.sample_tasks(jax.random.key(1), 1)[0]
        support = roll(params, task, jax.random.key(2))
        return policy, params, cfg, support

    def test_ppo_default_is_one_update(self):
        policy, params, cfg, support = self._setup()
        one = rl.single_adapt_step("ppo", policy, params, support, cfg)
        explicit = rl.single_adapt_step("ppo", policy, params, support,
                                        cfg, ppo_epochs=1)
        for a, b in zip(jax.tree_util.tree_leaves(one),
                        jax.tree_util.tree_leaves(explicit)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ppo_epochs_changes_result(self):
        policy, params, cfg, support = self._setup()
        one = rl.single_adapt_step("ppo", policy, params, support, cfg)
        three = rl.single_adapt_step("ppo", policy, params, support, cfg,
                                     ppo_epochs=cfg.ppo_epochs)
        diffs = [float(jnp.max(jnp.abs(a - b)))
                 for a, b in zip(jax.tree_util.tree_leaves(one),
                                 jax.tree_util.tree_leaves(three))]
        assert max(diffs) > 0

    def test_batched_collection_matches_fast_adapt_primal(self):
        """collect/eval lockstep paths keep the ppo_epochs semantics that
        the replay rederive (fast_adapt_ppo) assumes."""
        from exploring_meta_tpu.rl.host_batched import _batched_inner
        policy, params, cfg, support = self._setup()
        inner = _batched_inner("ppo", policy, cfg)   # default: cfg.ppo_epochs
        stack = jax.tree_util.tree_map(lambda x: x[None], support)
        pstack = jax.tree_util.tree_map(lambda x: x[None], params)
        batched = inner(pstack, stack)
        manual = rl.single_adapt_step("ppo", policy, params, support, cfg,
                                      ppo_epochs=cfg.ppo_epochs)
        for a, b in zip(jax.tree_util.tree_leaves(batched),
                        jax.tree_util.tree_leaves(manual)):
            np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_adapt_task_batched_zero_steps(self):
        """adapt_steps=0 (zero-shot eval) must not crash; no replay."""
        from exploring_meta_tpu.rl.host_batched import adapt_task_batched
        policy, params, cfg, _ = self._setup()
        cfg0 = cfg._replace(adapt_steps=0)
        env = Particles2D()
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        grouped = jax.vmap(lambda p, t, k: roll(p, t, k),
                           in_axes=(0, 0, None))
        tasks = env.sample_tasks(jax.random.key(3), 2)
        adapted, stacked, _ = adapt_task_batched(
            "ppo", policy, params, grouped, list(tasks), jax.random.key(4),
            cfg0)
        assert stacked is None
        for a in jax.tree_util.tree_leaves(adapted):
            assert a.shape[0] == 2
