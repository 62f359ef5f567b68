"""Serving-path tests (exploring_meta_tpu/serve.py): fused
adapt-on-support + predict-on-query programs, request batching, mesh
sharding, checkpoint loading, and RL policy adaptation serving."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import models, rl
from exploring_meta_tpu.serve import PolicyServer, VisionServer

WAYS, SHOTS, Q = 5, 1, 10
H = W = 28


def _request(key, ways=WAYS, shots=SHOTS, q=Q):
    kx, kq = jax.random.split(key)
    sx = jax.random.normal(kx, (shots * ways, H, W, 1))
    sy = jnp.tile(jnp.arange(ways), shots)
    qx = jax.random.normal(kq, (q, H, W, 1))
    return sx, sy, qx


@pytest.fixture(scope="module")
def vision_server():
    spec = models.omniglot_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    return spec, params, VisionServer(spec, params, inner_lr=0.5,
                                      adapt_steps=2)


class TestVisionServer:
    def test_single_request_contract(self, vision_server):
        _, _, server = vision_server
        sx, sy, qx = _request(jax.random.key(1))
        preds, probs = server(sx, sy, qx)
        assert preds.shape == (Q,)
        assert probs.shape == (Q, WAYS)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0,
                                   rtol=1e-5)

    def test_adaptation_learns_the_support_set(self, vision_server):
        # Query the SUPPORT inputs back: after inner SGD on them, the
        # served predictions must label them better than chance.
        _, _, server = vision_server
        sx, sy, _ = _request(jax.random.key(2), shots=4)
        preds, _ = server(sx, sy, sx)
        acc = float((preds == sy).mean())
        assert acc > 0.5, acc

    def test_batch_matches_loop(self, vision_server):
        _, _, server = vision_server
        reqs = [_request(jax.random.key(10 + i)) for i in range(3)]
        bx, by, bq = (jnp.stack([r[i] for r in reqs]) for i in range(3))
        bpreds, bprobs = server.batch(bx, by, bq)
        for i, (sx, sy, qx) in enumerate(reqs):
            preds, probs = server(sx, sy, qx)
            np.testing.assert_array_equal(np.asarray(bpreds[i]),
                                          np.asarray(preds))
            np.testing.assert_allclose(np.asarray(bprobs[i]),
                                       np.asarray(probs), atol=1e-5)

    def test_ragged_batch_buckets(self, vision_server):
        """Non-power-of-two batches are padded to a bucket and sliced:
        results must match the loop, and distinct sizes within one bucket
        must reuse the same compiled shape (B=5 and B=7 both pad to 8)."""
        _, _, server = vision_server
        from exploring_meta_tpu.serve import VisionServer
        assert VisionServer._bucket(5) == 8 == VisionServer._bucket(7)
        assert VisionServer._bucket(8) == 8
        assert VisionServer._bucket(9, multiple=8) == 16
        # non-power-of-two device counts must terminate (round up to the
        # next multiple, not double forever)
        assert VisionServer._bucket(5, multiple=3) == 9
        assert VisionServer._bucket(4, multiple=6) == 6
        reqs = [_request(jax.random.key(40 + i)) for i in range(7)]
        bx, by, bq = (jnp.stack([r[i] for r in reqs]) for i in range(3))
        for B in (5, 7):
            preds, probs = server.batch(bx[:B], by[:B], bq[:B])
            assert preds.shape[0] == B and probs.shape[0] == B
            for i in range(B):
                p1, _ = server(*reqs[i])
                np.testing.assert_array_equal(np.asarray(preds[i]),
                                              np.asarray(p1))

    def test_mesh_sharded_batch_matches(self, vision_server):
        spec, params, _ = vision_server
        from exploring_meta_tpu.parallel.mesh import make_task_mesh
        mesh = make_task_mesh(8, axis="requests")
        # One mild inner step: GSPMD partitioning reorders fusions, and
        # inner SGD amplifies last-ulp differences chaotically — a short
        # adaptation keeps the comparison numerically meaningful.
        kw = dict(inner_lr=0.1, adapt_steps=1)
        sharded = VisionServer(spec, params, mesh=mesh, **kw)
        plain = VisionServer(spec, params, **kw)
        reqs = [_request(jax.random.key(20 + i)) for i in range(8)]
        bx, by, bq = (jnp.stack([r[i] for r in reqs]) for i in range(3))
        preds_m, probs_m = sharded.batch(bx, by, bq)
        preds, probs = plain.batch(bx, by, bq)
        np.testing.assert_array_equal(np.asarray(preds_m),
                                      np.asarray(preds))
        np.testing.assert_allclose(np.asarray(probs_m), np.asarray(probs),
                                   rtol=1e-3, atol=1e-4)
        # Ragged batch: 5 requests on an 8-device mesh — padded up, then
        # sliced back; results must match the unsharded server exactly.
        preds_r, probs_r = sharded.batch(bx[:5], by[:5], bq[:5])
        assert preds_r.shape[0] == probs_r.shape[0] == 5
        np.testing.assert_array_equal(np.asarray(preds_r),
                                      np.asarray(preds[:5]))

    def test_anil_and_bf16_paths(self, vision_server):
        spec = models.anil_omniglot_spec(ways=WAYS)
        params = models.init_cnn4(jax.random.key(3), spec)
        for dtype in (None, jnp.bfloat16):
            server = VisionServer(spec, params, inner_lr=0.5, adapt_steps=1,
                                  anil=True, compute_dtype=dtype)
            sx, sy, qx = _request(jax.random.key(4))
            preds, probs = server(sx, sy, qx)
            assert preds.shape == (Q,)
            assert probs.dtype == jnp.float32  # outputs f32 either way

    def test_from_checkpoint(self, vision_server, tmp_path):
        spec, params, server = vision_server
        from exploring_meta_tpu.utils.experiment import flatten_params
        path = str(tmp_path / "model.npz")
        np.savez(path, **{k: np.asarray(v)
                          for k, v in flatten_params(params).items()})
        loaded = VisionServer.from_checkpoint(path, spec, inner_lr=0.5,
                                              adapt_steps=2)
        sx, sy, qx = _request(jax.random.key(5))
        p1, _ = server(sx, sy, qx)
        p2, _ = loaded(sx, sy, qx)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


class TestPolicyServer:
    def _setup(self):
        from exploring_meta_tpu.envs import Particles2D
        env = Particles2D()
        policy = models.DiagNormalPolicy(input_size=env.obs_size,
                                         output_size=env.action_size)
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.1, adapt_steps=1, adapt_batch_size=4,
                          max_path_length=12)
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=12)
        task = env.sample_tasks(jax.random.key(1), 1)[0]
        support = roll(params, task, jax.random.key(2))
        return policy, params, cfg, support

    def test_adapt_matches_analysis_semantics(self):
        policy, params, cfg, support = self._setup()
        server = PolicyServer(policy, params, cfg, algo="vpg")
        adapted = server.adapt(support)
        expected = rl.single_adapt_step("vpg", policy, params, support, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(adapted),
                        jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_adapt_steps_budget(self):
        # steps=0 is "no adaptation", and the batched path applies the
        # SAME multi-step budget as the single-task path.
        policy, params, cfg, support = self._setup()
        cfg = cfg._replace(adapt_steps=2)
        server = PolicyServer(policy, params, cfg, algo="vpg")
        base = server.adapt(support, steps=0)
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        single = server.adapt(support)               # 2 inner updates
        stack = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), support)
        batched = server.adapt_batched(stack)        # 2 updates per task
        for a, b in zip(jax.tree_util.tree_leaves(single),
                        jax.tree_util.tree_leaves(batched)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b)[0],
                                       atol=1e-6)

    def test_batched_adapt_and_actions(self):
        policy, params, cfg, support = self._setup()
        server = PolicyServer(policy, params, cfg, algo="ppo")
        stack = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x]), support)
        adapted = server.adapt_batched(stack)
        lead = jax.tree_util.tree_leaves(adapted)[0]
        assert lead.shape[0] == 2
        obs = jnp.zeros((3, policy.input_size))
        a_det = server.act(params, obs)
        a_sto = server.sample(params, jax.random.key(3), obs)
        assert a_det.shape == a_sto.shape == (3, policy.output_size)
        # deterministic action is the Gaussian mean — reproducible
        np.testing.assert_array_equal(np.asarray(a_det),
                                      np.asarray(server.act(params, obs)))

    def test_rejects_unknown_algo(self):
        policy, params, cfg, _ = self._setup()
        with pytest.raises(ValueError):
            PolicyServer(policy, params, cfg, algo="sgd")

    def test_from_checkpoint(self, tmp_path):
        policy, params, cfg, support = self._setup()
        from exploring_meta_tpu.utils.experiment import flatten_params
        path = str(tmp_path / "model.npz")
        np.savez(path, **{k: np.asarray(v)
                          for k, v in flatten_params(params).items()})
        loaded = PolicyServer.from_checkpoint(path, policy, cfg, algo="vpg")
        fresh = PolicyServer(policy, params, cfg, algo="vpg")
        a = loaded.adapt(support)
        b = fresh.adapt(support)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_mesh_sharded_adapt_matches(self):
        """Mesh-sharded adapt_batched == single-device adapt_batched,
        including a ragged task count (5 on an 8-device mesh: padded up
        to the bucket, padding sliced off)."""
        from exploring_meta_tpu.parallel.mesh import make_task_mesh
        policy, params, cfg, support = self._setup()
        n = 5
        stack = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * n), support)
        plain = PolicyServer(policy, params, cfg, algo="vpg")
        sharded = PolicyServer(policy, params, cfg, algo="vpg",
                               mesh=make_task_mesh(8, axis="requests"))
        a = plain.adapt_batched(stack)
        b = sharded.adapt_batched(stack)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            assert x.shape[0] == n and y.shape[0] == n
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)

    def test_fleet_action_fns(self):
        """act_batched/sample_batched: one program for n tasks' adapted
        params acting on their own env batches — per-task actions must
        match the per-task single act()."""
        policy, params, cfg, support = self._setup()
        server = PolicyServer(policy, params, cfg, algo="vpg")
        n = 3  # ragged fleet: bucketed up to 4, padding sliced off
        stack = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * n), support)
        adapted = server.adapt_batched(stack)
        obs = jnp.arange(n * 3 * policy.input_size, dtype=jnp.float32
                         ).reshape(n, 3, policy.input_size) / 10.0
        fleet = server.act_batched(adapted, obs)
        assert fleet.shape == (n, 3, policy.output_size)
        for i in range(n):
            one = jax.tree_util.tree_map(lambda x: x[i], adapted)
            np.testing.assert_allclose(np.asarray(fleet[i]),
                                       np.asarray(server.act(one, obs[i])),
                                       atol=1e-6)
        keys = jax.random.split(jax.random.key(9), n)
        sto = server.sample_batched(adapted, keys, obs)
        assert sto.shape == fleet.shape
