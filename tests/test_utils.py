"""Utils tests: plotters, profiling, experiment artifact contract, DiCE."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exploring_meta_tpu import rl
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy
from exploring_meta_tpu.utils import plotter
from exploring_meta_tpu.utils.profiling import PhaseTimer
from exploring_meta_tpu.utils.experiment import Experiment


class TestPlotter:
    def test_plot_dict_saves_png(self, tmp_path):
        plotter.plot_dict({"title": "Test Curve", "x_legend": "x",
                           "y_legend": "y", "x_axis": [0, 1, 2],
                           "y_axis": [1.0, 2.0, 1.5], "std": [0.1, 0.1, 0.1]},
                          save=True, path=str(tmp_path))
        assert os.path.exists(tmp_path / "Test_Curve.png")

    def test_plot_dict_explicit(self, tmp_path):
        plotter.plot_dict_explicit({"title": "Layers", "x_legend": "l",
                                    "y_legend": "cca",
                                    "y_axis": {"1": [0.9, 0.8], "4": [0.5, 0.4]}},
                                   save=True, path=str(tmp_path))
        assert os.path.exists(tmp_path / "Layers.png")

    def test_bar_plot_ml10(self, tmp_path):
        plotter.bar_plot_ml10({"reach": [10.0, 0.8], "push": [5.0, 0.2]},
                              save_path=str(tmp_path / "bars.png"))
        assert os.path.exists(tmp_path / "bars.png")

    def test_confidence_band_across_runs(self, tmp_path):
        for i in range(3):
            d = tmp_path / f"run{i}"
            os.makedirs(d)
            with open(d / "metrics.json", "w") as f:
                json.dump({"train_acc": [0.2 + 0.1 * i, 0.5, 0.7]}, f)
        res = plotter.plot_runs_with_confidence(
            [str(tmp_path / f"run{i}") for i in range(3)],
            metric="train_acc", save_path=str(tmp_path / "conf.png"))
        assert len(res["mean"]) == 3
        assert res["mean"][1] == pytest.approx(0.5)
        assert os.path.exists(tmp_path / "conf.png")


class TestCheckpointSweepPlot:
    def test_sweeps_and_confidence(self, tmp_path):
        for i in range(3):
            d = tmp_path / f"run{i}"
            d.mkdir()
            with open(d / "ckpnt_results.json", "w") as f:
                json.dump({"0": 0.5 + 0.01 * i, "100": 0.8 + 0.01 * i,
                           "200": 0.9, "99999": 0.95}, f)
        res = plotter.plot_checkpoint_sweeps(
            [str(tmp_path / f"run{i}") for i in range(3)],
            save_path=str(tmp_path / "sweeps.png"), max_checkpoint=20000)
        assert res["checkpoints"] == [0, 100, 200]
        assert res["mean"][1] == pytest.approx(0.81)
        assert res["halfwidth"][2] == pytest.approx(0.0)
        assert os.path.exists(tmp_path / "sweeps.png")


class TestProfiling:
    def test_phase_timer(self, tmp_path):
        timer = PhaseTimer()
        x = jnp.ones((100, 100))
        with timer.phase("matmul", block_on=None):
            y = x @ x
        with timer.phase("matmul", block_on=y):
            y = y @ x
        s = timer.summary()
        assert s["matmul"]["count"] == 2
        assert s["matmul"]["total_s"] > 0
        timer.save(str(tmp_path / "phases.json"))
        assert os.path.exists(tmp_path / "phases.json")

    def test_phase_timer_syncs_inner_outputs(self):
        """Outputs created inside the block are registered via the yielded
        list and host-fetched before the clock stops (block_until_ready is
        a no-op on this runtime — only a fetch is a real barrier)."""
        timer = PhaseTimer()
        with timer.phase("work") as sync:
            y = jnp.ones((200, 200)) @ jnp.ones((200, 200))
            sync.append(y)
        assert timer.summary()["work"]["total_s"] > 0

    @pytest.mark.slow
    def test_profiled_rl_trainer_writes_phase_times(self, tmp_path):
        from exploring_meta_tpu.trainers.rl import RLTrainer
        from exploring_meta_tpu.utils.config import RLScriptConfig

        cfg = RLScriptConfig(env="Particles2D-v1", num_iterations=2,
                             meta_batch_size=2, adapt_batch_size=2,
                             max_path_length=10, save_every=5,
                             n_eval_tasks=2, seed=0, profile=True)
        trainer = RLTrainer(cfg, algo="trpo", path=str(tmp_path) + "/")
        trainer.run()
        with open(os.path.join(trainer.model_path,
                               "phase_times.json")) as f:
            phases = json.load(f)
        assert phases["collect"]["count"] == 2
        assert phases["meta_step"]["count"] == 2
        assert phases["collect"]["total_s"] > 0


class TestExperimentContract:
    def test_run_dir_and_artifacts(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        exp = Experiment("maml_5w1s", "omni", {"seed": 7}, path="results/")
        assert os.path.isdir(os.path.join(exp.model_path, "model_checkpoints"))
        # run-dir naming: <algo>_<dataset>_<date>_<seed>_<rand>
        base = os.path.basename(exp.model_path)
        assert base.startswith("maml_5w1s_omni_")
        assert "_7_" in base

        exp.log_metrics({"train_acc": 0.5})
        exp.log_metrics({"train_acc": 0.6})
        exp.logger["test_acc"] = 0.7
        exp.save_logs_to_file()
        with open(os.path.join(exp.model_path, "metrics.json")) as f:
            assert json.load(f)["train_acc"] == [0.5, 0.6]
        with open(os.path.join(exp.model_path, "logger.json")) as f:
            logger = json.load(f)
        assert logger["config"]["algo"] == "maml_5w1s"
        assert logger["test_acc"] == 0.7

    def test_acc_matrix_artifact(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        exp = Experiment("a", "b", {}, path="results/")
        exp.save_acc_matrix(np.eye(3))
        assert os.path.exists(os.path.join(exp.model_path, "acc_matrix.out"))


class TestDiCE:
    def test_dice_vpg_loss_differs_and_is_finite(self):
        """The DiCE VPG variant (reference rl.py:219-224) must produce a
        different (higher-order-correct) loss surface than plain a2c."""
        env = Particles2D()
        policy = DiagNormalPolicy(input_size=2, output_size=2,
                                  hiddens=(16, 16))
        params = policy.init(jax.random.key(0))
        cfg = rl.RLConfig(adapt_batch_size=4, max_path_length=10)
        roll = rl.make_rollout(env, policy.sample, episodes=4, horizon=10)
        task = env.sample_tasks(jax.random.key(1), 1)[0]
        traj = roll(params, task, jax.random.key(2))

        plain = rl.vpg_a2c_loss(policy, params, traj, cfg, dice=False)
        dice = rl.vpg_a2c_loss(policy, params, traj, cfg, dice=True)
        assert np.isfinite(float(plain)) and np.isfinite(float(dice))

        g_plain = jax.grad(lambda p: rl.vpg_a2c_loss(policy, p, traj, cfg))(params)
        g_dice = jax.grad(lambda p: rl.vpg_a2c_loss(policy, p, traj, cfg,
                                                    dice=True))(params)
        total = sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(g_dice))
        assert np.isfinite(total) and total > 0
        # gradients should differ (different estimator)
        diffs = jax.tree_util.tree_map(
            lambda a, b: np.abs(np.asarray(a - b)).max(), g_plain, g_dice)
        assert max(jax.tree_util.tree_leaves(diffs)) > 1e-8


@pytest.mark.slow
class TestAsyncCheckpoints:
    def test_async_checkpoint_roundtrip(self, tmp_path, monkeypatch):
        """async_write checkpoints land after flush and load back
        bit-identical (incl. opt/rng resume state)."""
        from exploring_meta_tpu.utils.experiment import load_checkpoint
        monkeypatch.chdir(tmp_path)
        e = Experiment("maml", "omni", {"seed": 0})
        params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
        opt_state = {"m": jnp.zeros(4)}
        key = jax.random.key(3)
        for i in range(3):
            e.save_model_checkpoint(params, i, opt_state=opt_state,
                                    rng_key=key, async_write=True)
        e.flush_checkpoints()
        path = os.path.join(e.model_path, "model_checkpoints", "model_2.npz")
        p, o, k, it = load_checkpoint(path, params, opt_state)
        assert it == 2
        np.testing.assert_array_equal(np.asarray(p["w"]), np.arange(4.0))
        np.testing.assert_array_equal(np.asarray(o["m"]), np.zeros(4))
        assert jax.random.key_data(k).tolist() == \
            jax.random.key_data(key).tolist()

    def test_async_checkpoint_in_trainer(self, tmp_path, monkeypatch):
        """--async_ckpt through the vision trainer: files present and
        loadable at the end of the run."""
        import glob
        monkeypatch.chdir(tmp_path)
        from exploring_meta_tpu.trainers import VisionTrainer
        from exploring_meta_tpu.utils.config import VisionConfig

        cfg = VisionConfig(dataset="omni", num_iterations=3,
                           meta_batch_size=2, save_every=1, synthetic=True,
                           async_ckpt=True)
        t = VisionTrainer(cfg, anil=False)
        t.run()
        ckpts = glob.glob(os.path.join(t.model_path, "model_checkpoints",
                                       "*.npz"))
        assert len(ckpts) == 3


class TestDivergenceWatchdog:
    """NaN watchdog: a non-finite ``*loss`` metric raises DivergenceError
    (after recording the evidence), trainers catch it and finish
    gracefully with logger['diverged'] set."""

    def _exp(self, tmp_path, monkeypatch, **params):
        monkeypatch.chdir(tmp_path)
        from exploring_meta_tpu.utils.experiment import Experiment
        return Experiment("algo", "ds", params, path="results/")

    def test_nan_loss_raises_and_records(self, tmp_path, monkeypatch):
        from exploring_meta_tpu.utils.experiment import DivergenceError
        exp = self._exp(tmp_path, monkeypatch)
        exp.log_metrics({"train_loss": 1.0})
        with pytest.raises(DivergenceError):
            exp.log_metrics({"train_loss": float("nan")})
        assert np.isnan(exp.metrics["train_loss"][-1])  # evidence kept
        with pytest.raises(DivergenceError):
            exp.log_metrics({"valid_loss": float("inf")})

    def test_non_loss_keys_and_off_switch(self, tmp_path, monkeypatch):
        exp = self._exp(tmp_path, monkeypatch)
        exp.log_metrics({"test_acc": float("nan"),
                         "adapt_reward": float("-inf")})  # no raise
        exp2 = self._exp(tmp_path, monkeypatch, nan_guard=False)
        exp2.log_metrics({"train_loss": float("nan")})  # no raise

    @pytest.mark.slow
    def test_trainer_finishes_gracefully(self, tmp_path, monkeypatch):
        """A NaN-poisoned vision run stops at the first logged iteration,
        marks the logger, and still saves model + metrics + test eval."""
        import exploring_meta_tpu.tasks as tasks_mod
        from exploring_meta_tpu.trainers import VisionTrainer
        from exploring_meta_tpu.utils.config import VisionConfig

        monkeypatch.chdir(tmp_path)
        real_sample = tasks_mod.sample_task_batch

        def poisoned(key, ds, ways, shots, batch):
            data, labels = real_sample(key, ds, ways, shots, batch)
            return data * float("nan"), labels

        monkeypatch.setattr(tasks_mod, "sample_task_batch", poisoned)
        cfg = VisionConfig(synthetic=True, num_iterations=5,
                           meta_batch_size=2, save_every=10,
                           compile_cache="off")
        tr = VisionTrainer(cfg, anil=False, path=str(tmp_path) + "/results/")
        tr.run()
        assert "diverged" in tr.logger
        assert tr.params["num_iterations"] < 5  # truncated like an interrupt
        assert os.path.exists(os.path.join(tr.model_path, "model.npz"))
        mpath = os.path.join(tr.model_path, "metrics.json")
        # strict-JSON contract: the recorded NaN evidence serializes as null
        m = json.loads(open(mpath).read())
        assert m["train_loss"][-1] is None
        assert "nan" in tr.logger["diverged"]
        # logger.json is strict JSON too (nested non-finite -> null)
        tr.logger["final_eval"] = {"mean_reward": float("nan")}
        tr.save_logs_to_file()
        lg = json.loads(open(os.path.join(tr.model_path,
                                          "logger.json")).read())
        assert lg["final_eval"]["mean_reward"] is None
