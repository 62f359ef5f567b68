"""Pallas kernels must match the XLA reference ops exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import ops
from exploring_meta_tpu.pallas import discount_pallas, gae_pallas


def _mk(T, E, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.normal(size=(T, E)).astype(np.float32)
    d = (rng.uniform(size=(T, E)) < 0.15).astype(np.float32)
    d[-1] = 1.0
    v = rng.normal(size=(T, E)).astype(np.float32)
    return jnp.asarray(r), jnp.asarray(d), jnp.asarray(v)


@pytest.mark.parametrize("T,E", [(20, 4), (150, 20), (7, 1), (64, 300)])
def test_discount_matches_xla(T, E):
    r, d, _ = _mk(T, E)
    got = discount_pallas(0.97, r, d)
    want = ops.discount(0.97, r, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,E", [(20, 4), (150, 20), (64, 300)])
def test_gae_matches_xla(T, E):
    r, d, v = _mk(T, E, seed=1)
    got = gae_pallas(0.95, 0.9, r, d, v)
    want = ops.generalized_advantage(0.95, 0.9, r, d, v, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gae_1d_input():
    r, d, v = _mk(31, 1, seed=2)
    got = gae_pallas(0.99, 1.0, r[:, 0], d[:, 0], v[:, 0])
    want = ops.generalized_advantage(0.99, 1.0, r[:, 0], d[:, 0], v[:, 0], 0.0)
    assert got.shape == (31,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
