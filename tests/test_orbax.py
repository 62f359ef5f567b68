"""Orbax checkpoint backend (utils/orbax_ckpt.py, --ckpt_backend orbax).

Covers the npz-contract mirror (params/opt/rng/iteration roundtrip), the
TPU-native selling point (restore directly INTO a target sharding on the
8-virtual-device mesh), and trainer integration (orbax resume continues
the iteration count exactly like the npz path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from exploring_meta_tpu.utils.orbax_ckpt import (
    OrbaxCheckpointer,
    load_orbax_checkpoint,
)


def _params(key):
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.normal(k1, (8, 4)),
            "b": jnp.zeros((4,)),
            "blocks": [{"g": jax.random.normal(k2, (3, 3))}]}


class TestRoundtrip:
    def test_params_opt_rng_iteration(self, tmp_path):
        params = _params(jax.random.key(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        rng = jax.random.key(123)

        ck = OrbaxCheckpointer(str(tmp_path / "ckpts"))
        ck.save(7, params, opt_state=opt_state, rng_key=rng)
        ck.wait()
        assert ck.latest_step() == 7
        p2, o2, r2, step = ck.restore(params, opt_template=opt_state)
        ck.close()

        assert step == 7
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), params, p2)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), opt_state, o2)
        assert jnp.array_equal(jax.random.key_data(rng),
                               jax.random.key_data(r2))

    def test_params_only_save_restores_none_opt_rng(self, tmp_path):
        params = _params(jax.random.key(1))
        ck = OrbaxCheckpointer(str(tmp_path / "ckpts"))
        ck.save(0, params)
        ck.wait()
        p2, o2, r2, step = ck.restore(params, opt_template=None)
        ck.close()
        assert step == 0 and o2 is None and r2 is None
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), params, p2)

    def test_multiple_steps_latest_wins(self, tmp_path):
        ck = OrbaxCheckpointer(str(tmp_path / "ckpts"))
        for step in (2, 4, 6):
            ck.save(step, {"x": jnp.full((2,), float(step))})
        ck.wait()
        p, _, _, step = ck.restore({"x": jnp.zeros((2,))})
        ck.close()
        assert step == 6
        np.testing.assert_array_equal(np.asarray(p["x"]), [6.0, 6.0])


class TestShardedRestore:
    """The reason orbax exists: sharded arrays save per-shard and restore
    into ANY target sharding — no host gather, no device_put afterwards."""

    def _mesh(self):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()), ("tasks",))

    def test_save_sharded_restore_resharded(self, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        n = len(jax.devices())
        assert n == 8  # conftest forces the 8-virtual-device CPU backend

        row_sharded = NamedSharding(mesh, P("tasks", None))
        replicated = NamedSharding(mesh, P())
        x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
        params = {"w": jax.device_put(x, row_sharded)}
        assert params["w"].sharding.is_equivalent_to(row_sharded, 2)

        ck = OrbaxCheckpointer(str(tmp_path / "ckpts"))
        ck.save(1, params)
        ck.wait()
        ck.close()

        # restore the row-sharded checkpoint as fully replicated...
        p_rep, _, _, _ = load_orbax_checkpoint(
            str(tmp_path / "ckpts"), {"w": jnp.zeros((8, 4))},
            shardings={"w": replicated})
        assert p_rep["w"].sharding.is_equivalent_to(replicated, 2)
        np.testing.assert_array_equal(np.asarray(p_rep["w"]), np.asarray(x))

        # ...and back into the row sharding
        p_row, _, _, _ = load_orbax_checkpoint(
            str(tmp_path / "ckpts"), {"w": jnp.zeros((8, 4))},
            shardings={"w": row_sharded})
        assert p_row["w"].sharding.is_equivalent_to(row_sharded, 2)
        np.testing.assert_array_equal(np.asarray(p_row["w"]), np.asarray(x))


@pytest.mark.slow  # ~50s: two full (tiny) trainer runs + compiles
class TestTrainerIntegration:
    def test_vision_trainer_orbax_resume(self, tmp_path, monkeypatch):
        """Mirror of test_maml.py::TestResume on the orbax backend: the
        resumed run continues at done_iter + 1."""
        monkeypatch.chdir(tmp_path)
        from exploring_meta_tpu.trainers import VisionTrainer
        from exploring_meta_tpu.utils.config import VisionConfig

        cfg = VisionConfig(dataset="omni", num_iterations=3,
                           meta_batch_size=2, save_every=2, synthetic=True,
                           ckpt_backend="orbax")
        t1 = VisionTrainer(cfg, anil=False)
        t1.run()
        ckpt_dir = os.path.join(t1.model_path, "model_checkpoints")
        # orbax layout: numbered step dirs, no npz files
        assert os.path.isdir(os.path.join(ckpt_dir, "2"))

        cfg2 = VisionConfig(dataset="omni", num_iterations=5,
                            meta_batch_size=2, save_every=10,
                            synthetic=True, resume=ckpt_dir,
                            ckpt_backend="orbax")
        t2 = VisionTrainer(cfg2, anil=False)
        acc = t2.run()
        # step 2 was written AFTER iteration 2 completed -> train [3..5)
        assert len(t2.metrics["train_loss"]) == 2
        assert 0.0 <= acc <= 1.0
