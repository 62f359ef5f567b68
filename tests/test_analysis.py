"""Analysis-suite tests: CL experiments, rep-change probes, offline eval."""

import json
import os

import numpy as np
import jax
import pytest

from exploring_meta_tpu import adapt, models, rl, tasks
from exploring_meta_tpu.analysis import (
    run_cl_exp, run_cl_rl_exp, run_rep_exp, run_rep_rl_exp, sanity_check,
    measure_change_through_time,
)
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy


@pytest.fixture(scope="module")
def vision_setup():
    train, _, test = tasks.load_omniglot(seed=0, synthetic=True,
                                         synthetic_classes=30)
    spec = models.omniglot_spec(ways=5, hidden=8, layers=4)
    params = models.init_cnn4(jax.random.key(0), spec)
    apply_fn = lambda p, x: models.cnn4_apply(p, spec, x)
    return spec, params, apply_fn, test


@pytest.mark.slow
class TestCLVision:
    def test_cl_exp_artifacts_and_shape(self, vision_setup, tmp_path):
        spec, params, apply_fn, test_ds = vision_setup
        acc, res = run_cl_exp(str(tmp_path), apply_fn, params, test_ds,
                              ways=5, shots=1, key=jax.random.key(1),
                              cl_params={"adapt_steps": 1, "inner_lr": 0.1,
                                         "n_tasks": 4})
        assert acc.shape == (4, 4)
        assert set(res) == {"av_acc", "fwt", "rem", "bwt_plus"}
        assert os.path.exists(tmp_path / "cl_exp" / "acc_matrix.out")
        assert os.path.exists(tmp_path / "cl_exp" / "cl_res.json")

    def test_cl_setting1_diagonal_learns(self, vision_setup, tmp_path):
        """Setting 1 evaluates on adaptation data: the diagonal should be
        at least as good as the off-diagonal on average."""
        spec, params, apply_fn, test_ds = vision_setup
        acc, _ = run_cl_exp(str(tmp_path), apply_fn, params, test_ds,
                            ways=5, shots=5, key=jax.random.key(2),
                            cl_params={"adapt_steps": 3, "inner_lr": 0.3,
                                       "n_tasks": 3}, setting=1)
        diag = np.diag(acc).mean()
        off = acc[~np.eye(3, dtype=bool)].mean()
        assert diag >= off


@pytest.mark.slow
class TestCLRL:
    def test_cl_rl_exp(self, tmp_path):
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(16, 16))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                          max_path_length=10)
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        rew, res_rew, res_suc = run_cl_rl_exp(
            str(tmp_path), policy, params, env, roll, cfg,
            key=jax.random.key(1), n_tasks=3, algo="trpo")
        assert rew.shape == (3, 3)
        assert np.isfinite(rew).all()
        assert os.path.exists(tmp_path / "cl_exp" / "cl_rew_matrix.out")


class TestRepChange:
    def test_rep_exp_cca_in_range(self, vision_setup, tmp_path):
        spec, params, apply_fn, test_ds = vision_setup
        rep_fn = lambda p, x, layer: models.get_rep_layer(p, spec, x, layer)
        res = run_rep_exp(str(tmp_path), apply_fn, rep_fn, params, test_ds,
                          ways=5, shots=5, key=jax.random.key(3),
                          rep_params={"adapt_steps": 1, "inner_lr": 0.1,
                                      "n_tasks": 2, "layers": [1, 4]})
        for layer, vals in res["cca"].items():
            assert len(vals) == 2
            assert all(0.0 <= v <= 1.001 for v in vals)
        assert os.path.exists(tmp_path / "rep_exp" / "cca_results.json")

    def test_zero_lr_adaptation_gives_identical_reps(self, vision_setup,
                                                     tmp_path):
        """inner_lr=0 -> adapted == init -> CCA similarity == 1."""
        spec, params, apply_fn, test_ds = vision_setup
        rep_fn = lambda p, x, layer: models.get_rep_layer(p, spec, x, layer)
        res = run_rep_exp(str(tmp_path), apply_fn, rep_fn, params, test_ds,
                          ways=5, shots=5, key=jax.random.key(4),
                          rep_params={"adapt_steps": 1, "inner_lr": 0.0,
                                      "n_tasks": 1, "layers": [2]})
        assert res["cca"]["2"][0] == pytest.approx(1.0, abs=1e-3)

    @pytest.mark.slow
    def test_rep_rl_exp(self, tmp_path):
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(16, 16))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=4,
                          max_path_length=10)
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        res = run_rep_rl_exp(str(tmp_path), policy, params, env, roll, cfg,
                             key=jax.random.key(5),
                             rep_params={"n_tasks": 2, "layers": [1]})
        assert len(res["cca"]["1"]) == 2

    def test_sanity_check_rejects_nondeterminism(self):
        import jax.numpy as jnp
        calls = [0]

        def flaky_rep(params, x):
            calls[0] += 1
            return jnp.asarray(np.random.default_rng(calls[0]).normal(size=(3, 2)))

        with pytest.raises(AssertionError):
            sanity_check(flaky_rep, None, None)

    def test_measure_change_through_time(self, vision_setup, tmp_path):
        spec, params, apply_fn, test_ds = vision_setup
        p2 = jax.tree_util.tree_map(lambda x: x * 1.01, params)
        inputs = jax.numpy.zeros((20, 28, 28, 1)) + 0.1 * jax.random.normal(
            jax.random.key(0), (20, 28, 28, 1))
        rep_fn = lambda p, x: models.cnn4_features(p, spec, x)
        sims = measure_change_through_time(str(tmp_path), [params, p2, p2],
                                           rep_fn, inputs)
        assert len(sims) == 2
        assert sims[1] == pytest.approx(1.0, abs=1e-3)  # identical ckpts


@pytest.mark.slow
class TestOfflineEval:
    def test_eval_vision_roundtrip(self, tmp_path, monkeypatch):
        """Train 2 iterations via the trainer, then run the offline eval
        driver against the produced run dir."""
        monkeypatch.chdir(tmp_path)
        from exploring_meta_tpu.trainers import VisionTrainer
        from exploring_meta_tpu.utils.config import VisionConfig
        from exploring_meta_tpu.analysis import eval_vision

        cfg = VisionConfig(dataset="omni", num_iterations=2,
                           meta_batch_size=4, save_every=1, synthetic=True)
        trainer = VisionTrainer(cfg, anil=False)
        trainer.run()

        out = eval_vision.run(trainer.model_path, n_eval_batches=2,
                              run_cl=True, run_rc=True,
                              cl_params={"adapt_steps": 1, "inner_lr": 0.1,
                                         "n_tasks": 3},
                              rep_params={"adapt_steps": 1, "inner_lr": 0.1,
                                          "n_tasks": 2, "layers": [4]},
                              synthetic=True)
        assert 0.0 <= out["test_acc"] <= 1.0
        assert len(out["ckpnt_results"]) == 2
        assert os.path.exists(os.path.join(trainer.model_path,
                                           "eval_results.json"))

    def test_eval_rl_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from exploring_meta_tpu.trainers.rl import RLTrainer
        from exploring_meta_tpu.utils.config import RLScriptConfig
        from exploring_meta_tpu.analysis import eval_rl

        cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=2,
                             meta_batch_size=2, adapt_batch_size=2,
                             max_path_length=8, save_every=1,
                             n_eval_tasks=2)
        trainer = RLTrainer(cfg, algo="trpo", anil=False)
        trainer.run()

        out = eval_rl.run(trainer.model_path, run_eval=True, run_cl=True,
                          run_rc=True, n_eval_tasks=2)
        assert "eval" in out and np.isfinite(out["eval"]["mean_reward"])
        assert "cl_res_rew" in out
