"""Unit tests for the math-kernel layer against tiny numpy/torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import ops


def _np_discount(gamma, rewards, dones, bootstrap=0.0):
    out = np.zeros_like(rewards)
    carry = bootstrap
    for t in reversed(range(len(rewards))):
        carry = rewards[t] + gamma * carry * (1.0 - dones[t])
        out[t] = carry
    return out


class TestGAE:
    def test_discount_matches_loop(self):
        rng = np.random.default_rng(0)
        r = rng.normal(size=17).astype(np.float32)
        d = (rng.uniform(size=17) < 0.2).astype(np.float32)
        d[-1] = 1.0
        got = ops.discount(0.97, jnp.asarray(r), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(got), _np_discount(0.97, r, d), rtol=1e-5)

    def test_discount_resets_at_done(self):
        r = jnp.ones(6)
        d = jnp.array([0, 0, 1, 0, 0, 1], dtype=jnp.float32)
        got = np.asarray(ops.discount(0.5, r, d))
        # episodes of length 3: returns 1.75, 1.5, 1
        np.testing.assert_allclose(got, [1.75, 1.5, 1.0, 1.75, 1.5, 1.0], rtol=1e-6)

    def test_flat_vs_time_major_equivalence(self):
        """[T,E] layout result equals per-column flat computation."""
        rng = np.random.default_rng(1)
        r = rng.normal(size=(10, 3)).astype(np.float32)
        d = np.zeros((10, 3), dtype=np.float32)
        d[-1] = 1.0
        d[4, 1] = 1.0
        got = np.asarray(ops.discount(0.9, jnp.asarray(r), jnp.asarray(d)))
        for e in range(3):
            np.testing.assert_allclose(got[:, e], _np_discount(0.9, r[:, e], d[:, e]),
                                       rtol=1e-5)

    def test_gae_matches_manual(self):
        rng = np.random.default_rng(2)
        T = 12
        r = rng.normal(size=T).astype(np.float32)
        d = np.zeros(T, dtype=np.float32)
        d[5] = 1.0
        d[-1] = 1.0
        v = rng.normal(size=T).astype(np.float32)
        gamma, tau = 0.95, 0.9
        nv = np.concatenate([v[1:], [0.0]])
        td = r + gamma * (1 - d) * nv - v
        expected = _np_discount(gamma * tau, td, d)
        got = ops.generalized_advantage(gamma, tau, jnp.asarray(r), jnp.asarray(d),
                                        jnp.asarray(v), 0.0)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)

    def test_compute_advantages_bootstrap_substitution(self):
        """At terminal steps the value fed to GAE is V(s') (reference quirk)."""
        T = 4
        r = jnp.ones(T)
        d = jnp.array([0, 0, 0, 1], dtype=jnp.float32)
        v = jnp.arange(1.0, T + 1)
        nsv = 10.0 * jnp.ones(T)
        adv = ops.compute_advantages(1.0, 1.0, r, d, v, nsv)
        boot = np.array([1, 2, 3, 10.0])
        nv = np.concatenate([boot[1:], [0.0]])
        td = np.ones(T) + (1 - np.array([0, 0, 0, 1.0])) * nv - boot
        expected = _np_discount(1.0, td, np.array([0, 0, 0, 1.0]))
        np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5)


class TestLosses:
    def test_a2c_loss(self):
        lp = jnp.array([-1.0, -2.0])
        adv = jnp.array([0.5, -0.5])
        np.testing.assert_allclose(float(ops.a2c_policy_loss(lp, adv)),
                                   -np.mean([-0.5, 1.0]), rtol=1e-6)

    def test_ppo_clip_matches_torch_style(self):
        rng = np.random.default_rng(3)
        new = rng.normal(size=32).astype(np.float32)
        old = rng.normal(size=32).astype(np.float32)
        adv = rng.normal(size=32).astype(np.float32)
        clip = 0.1
        ratio = np.exp(new - old)
        expected = -np.mean(np.minimum(ratio * adv,
                                       np.clip(ratio, 0.9, 1.1) * adv))
        got = float(ops.ppo_policy_loss(jnp.asarray(new), jnp.asarray(old),
                                        jnp.asarray(adv), clip))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_trpo_loss(self):
        new = jnp.array([-1.0, -1.0])
        old = jnp.array([-1.0, -2.0])
        adv = jnp.array([2.0, 2.0])
        expected = -np.mean([2.0, 2.0 * np.e])
        np.testing.assert_allclose(float(ops.trpo_policy_loss(new, old, adv)),
                                   expected, rtol=1e-5)

    def test_magic_box_value_and_grad(self):
        x = jnp.array(1.7)
        assert float(ops.magic_box(x)) == pytest.approx(1.0)
        g = jax.grad(lambda v: ops.magic_box(v))(x)
        assert float(g) == pytest.approx(1.0)  # d/dx exp(x - sg(x)) = exp(0)

    def test_cross_entropy_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(10, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=10)
        expected = torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels)).item()
        got = float(ops.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_accuracy(self):
        logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        labels = jnp.array([0, 1, 1])
        assert float(ops.accuracy(logits, labels)) == pytest.approx(2 / 3)

    def test_weighted_cumsum(self):
        v = jnp.array([1.0, 2.0, 3.0])
        w = jnp.array([0.0, 1.0, 1.0])
        np.testing.assert_allclose(np.asarray(ops.weighted_cumsum(v, w)),
                                   [1.0, 3.0, 6.0])


class TestStats:
    def test_normalize_unbiased(self):
        x = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
        got = np.asarray(ops.normalize(jnp.asarray(x)))
        expected = (x - x.mean()) / (x.std(ddof=1) + 1e-8)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_onehot(self):
        got = np.asarray(ops.onehot(jnp.array([0, 2]), dim=3))
        np.testing.assert_allclose(got, [[1, 0, 0], [0, 0, 1]])


class TestCG:
    def test_cg_solves_spd_system(self):
        rng = np.random.default_rng(5)
        m = rng.normal(size=(8, 8))
        a = m @ m.T + 8 * np.eye(8)
        b = rng.normal(size=8)
        a_j = jnp.asarray(a, dtype=jnp.float32)
        x = ops.conjugate_gradient(lambda v: a_j @ v,
                                   jnp.asarray(b, dtype=jnp.float32),
                                   num_iterations=50, tol=1e-12)
        np.testing.assert_allclose(np.asarray(a @ np.asarray(x, dtype=np.float64)),
                                   b, rtol=1e-3, atol=1e-3)

    def test_cg_is_jittable(self):
        a = jnp.eye(4) * 2.0
        b = jnp.ones(4)
        x = jax.jit(lambda bb: ops.conjugate_gradient(lambda v: a @ v, bb))(b)
        np.testing.assert_allclose(np.asarray(x), 0.5 * np.ones(4), rtol=1e-5)

    def test_hvp_quadratic(self):
        a = jnp.array([[2.0, 0.5], [0.5, 1.0]])

        def f(x):
            return 0.5 * x @ a @ x

        Ax = ops.hvp(f, jnp.zeros(2), damping=0.0)
        v = jnp.array([1.0, 2.0])
        np.testing.assert_allclose(np.asarray(Ax(v)), np.asarray(a @ v), rtol=1e-5)

    def test_tree_hvp(self):
        params = {"w": jnp.array([1.0, 2.0]), "b": jnp.array(0.5)}

        def f(p):
            return jnp.sum(p["w"] ** 2) + 3.0 * p["b"] ** 2

        Ax, flat, unravel = ops.tree_hvp(f, params, damping=0.0)
        hv = Ax(jnp.ones_like(flat))
        # Hessian is diag(2, 2, 6) in some flat order.
        assert sorted(np.asarray(hv).tolist()) == pytest.approx([2.0, 2.0, 6.0])


class TestLinearValue:
    def test_fit_recovers_linear_function(self):
        rng = np.random.default_rng(6)
        states = rng.normal(size=(200, 3)).astype(np.float32)
        t = np.tile(np.arange(20), 10).astype(np.float32)
        true_w = np.array([1.0, -2.0, 0.5])
        returns = states @ true_w + 0.3
        w = ops.fit_linear_value(jnp.asarray(states), jnp.asarray(t),
                                 jnp.asarray(returns), reg=1e-8)
        pred = ops.linear_value(w, jnp.asarray(states), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(pred)[:, 0], returns, atol=5e-2)

    def test_fit_not_differentiated(self):
        states = jnp.ones((10, 2))
        t = jnp.arange(10.0)

        def loss(s):
            w = ops.fit_linear_value(s, t, jnp.ones(10))
            return jnp.sum(w)

        g = jax.grad(loss)(states)
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestCCA_CKA:
    def test_cca_identical_activations(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(10, 100))
        _, mean = ops.get_cca_similarity(a, a, epsilon=1e-10)
        assert mean == pytest.approx(1.0, abs=1e-3)

    def test_cca_rotation_invariance(self):
        """CCA similarity is invariant to invertible linear maps."""
        rng = np.random.default_rng(8)
        a = rng.normal(size=(6, 200))
        q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
        _, mean = ops.get_cca_similarity(q @ a, a, epsilon=1e-10)
        assert mean == pytest.approx(1.0, abs=1e-3)

    def test_cca_independent_activations_low(self):
        rng = np.random.default_rng(9)
        a = rng.normal(size=(8, 2000))
        b = rng.normal(size=(8, 2000))
        _, mean = ops.get_cca_similarity(a, b, epsilon=1e-10)
        assert mean < 0.3

    def test_linear_cka_oracle(self):
        """Cross-check against the published numpy formulation."""
        rng = np.random.default_rng(10)
        x = rng.normal(size=(50, 8))
        y = rng.normal(size=(50, 12))

        def np_center(k):
            n = k.shape[0]
            h = np.eye(n) - np.ones((n, n)) / n
            return h @ k @ h

        def np_hsic(x, y):
            return np.sum(np_center(x @ x.T) * np_center(y @ y.T))

        expected = np_hsic(x, y) / np.sqrt(np_hsic(x, x) * np_hsic(y, y))
        got = float(ops.get_linear_CKA(x.astype(np.float32), y.astype(np.float32)))
        np.testing.assert_allclose(got, expected, rtol=1e-3)

    def test_kernel_cka_self_similarity(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(40, 6)).astype(np.float32)
        assert float(ops.get_kernel_CKA(x, x)) == pytest.approx(1.0, abs=1e-4)


class TestCLMetrics:
    def test_perfect_remembering(self):
        acc = np.ones((4, 4))
        res = ops.calc_cl_metrics(acc)
        assert res["av_acc"] == pytest.approx(1.0)
        assert res["fwt"] == pytest.approx(1.0)
        assert res["rem"] == pytest.approx(1.0)
        assert res["bwt_plus"] == pytest.approx(0.0)

    def test_catastrophic_forgetting(self):
        # diag 1, everything learned then fully forgotten
        acc = np.eye(3)
        res = ops.calc_cl_metrics(acc)
        assert res["rem"] < 1.0
        assert res["bwt_plus"] == 0.0

    def test_matches_reference_formula(self):
        rng = np.random.default_rng(12)
        acc = rng.uniform(size=(5, 5))
        res = ops.calc_cl_metrics(acc)
        n = 5
        assert res["av_acc"] == pytest.approx(np.tril(acc).sum() / (n * (n + 1) / 2))
        assert res["fwt"] == pytest.approx(np.triu(acc, 1).sum() / (n * (n - 1) / 2))


class TestKernelCKAOracle:
    """RBF-kernel CKA vs a direct numpy computation of the reference's
    formulas (utils/cka.py rbf/kernel_HSIC)."""

    def _np_rbf(self, X, sigma=None):
        GX = X @ X.T
        KX = np.diag(GX)[:, None] + np.diag(GX)[None, :] - 2 * GX
        if sigma is None:
            mdist = np.median(KX[KX != 0])
            sigma = np.sqrt(mdist)
        return np.exp(KX * (-0.5 / (sigma * sigma)))

    def test_rbf_gram_matches_numpy_oracle(self):
        from exploring_meta_tpu.ops.cka import _rbf_gram
        rng = np.random.default_rng(0)
        x = rng.normal(size=(12, 5))
        for sigma in (None, 1.0, 2.5):
            ours = np.asarray(_rbf_gram(jnp.asarray(x), sigma))
            ref = self._np_rbf(x, sigma)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(ours, ours.T, rtol=1e-5)  # symmetric

    def test_kernel_cka_oracle_and_jit(self):
        from exploring_meta_tpu.ops.cka import get_kernel_CKA

        def np_center(K):
            n = K.shape[0]
            H = np.eye(n) - np.ones((n, n)) / n
            return H @ K @ H

        def np_hsic(X, Y):
            return np.sum(np_center(self._np_rbf(X)) *
                          np_center(self._np_rbf(Y)))

        rng = np.random.default_rng(1)
        x = rng.normal(size=(10, 4))
        y = rng.normal(size=(10, 6))
        ref = np_hsic(x, y) / np.sqrt(np_hsic(x, x) * np_hsic(y, y))
        got = float(get_kernel_CKA(x, y))
        assert got == pytest.approx(ref, rel=1e-5)
        # symmetric in arguments, and jittable (median heuristic included)
        assert float(get_kernel_CKA(y, x)) == pytest.approx(got, rel=1e-5)
        jitted = float(jax.jit(get_kernel_CKA)(jnp.asarray(x),
                                               jnp.asarray(y)))
        assert jitted == pytest.approx(got, rel=1e-5)
