"""Multi-seed one-program sweeps (parallel/multiseed.py + sweep --vmap_seeds).

The invariant that makes the vmapped sweep trustworthy: row ``i`` of the
stacked result must equal a direct call of the SAME fused train scan on
seed ``i``'s state — vmap changes the schedule, never the math.
"""

import json
import os
import sys

import numpy as np
import jax
import optax
import pytest

from exploring_meta_tpu import adapt, models, parallel, rl, tasks
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.models import DiagNormalPolicy
from exploring_meta_tpu.tasks.sampler import sample_task


def _assert_trees_close(a, b, rtol=2e-4, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   atol=atol)


def _vision_setup():
    train, _, _ = tasks.load_omniglot(seed=0, synthetic=True,
                                      synthetic_classes=20)
    spec = models.omniglot_spec(ways=5, hidden=8, layers=2)
    fa = adapt.make_vision_fast_adapt(spec, 0.4, 1, 1, 5)
    opt = optax.sgd(0.1)

    def sample_fn(key, images):
        keys = jax.random.split(key, 2)
        return jax.vmap(lambda k: sample_task(
            k, images, 5, 1, train.invert, train.rotations))(keys)

    train_fn = adapt.make_train_scan(fa, opt, sample_fn, 2)
    return train, spec, opt, train_fn


def test_stack_seed_states_matches_trainer_derivation():
    """Seed s of the stack must start from the same params/key a solo
    ``--seed s`` trainer run derives (trainers/vision.py:58-60)."""
    spec = models.omniglot_spec(ways=5, hidden=8, layers=2)
    init = lambda ik: models.init_cnn4(ik, spec)
    params, opt_state, keys = parallel.stack_seed_states(init, [42, 7])
    assert opt_state is None
    key = jax.random.key(42)
    key, ik = jax.random.split(key)
    _assert_trees_close(jax.tree.map(lambda x: x[0], params), init(ik),
                        rtol=0, atol=0)
    assert jnp_keys_equal(keys[0], key)


def jnp_keys_equal(a, b):
    return bool(np.all(np.asarray(jax.random.key_data(a))
                       == np.asarray(jax.random.key_data(b))))


@pytest.mark.slow
def test_vision_sweep_rows_match_solo_runs():
    train, spec, opt, train_fn = _vision_setup()
    seeds = [42, 7]
    params, opt_state, keys = parallel.stack_seed_states(
        lambda ik: models.init_cnn4(ik, spec), seeds, opt)
    p_sw, _, m_sw = parallel.vmap_seeds(train_fn, 3, 1)(
        params, opt_state, keys, train.images)
    assert m_sw["loss"].shape == (2, 2)
    for i, s in enumerate(seeds):
        key = jax.random.key(s)
        key, ik = jax.random.split(key)
        p0 = models.init_cnn4(ik, spec)
        p1, _, m1 = train_fn(p0, opt.init(p0), key, train.images)
        _assert_trees_close(jax.tree.map(lambda x: x[i], p_sw), p1)
        np.testing.assert_allclose(np.asarray(m_sw["loss"][i]),
                                   np.asarray(m1["loss"]), rtol=2e-4,
                                   atol=1e-5)


@pytest.mark.slow
def test_trpo_sweep_rows_match_solo_runs():
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=2,
                      max_path_length=10)
    roll = rl.make_rollout(env, policy.sample, episodes=2, horizon=10)
    train_fn = rl.make_trpo_train_scan(env, policy, roll, cfg,
                                       rl.TRPOConfig(), meta_batch_size=2,
                                       n_steps=2)
    seeds = [42, 7]
    params, _, keys = parallel.stack_seed_states(policy.init, seeds)
    p_sw, m_sw = parallel.vmap_seeds(train_fn, 2)(params, keys)
    assert m_sw["meta_loss"].shape == (2, 2)
    for i, s in enumerate(seeds):
        key = jax.random.key(s)
        key, ik = jax.random.split(key)
        p1, _ = train_fn(policy.init(ik), key)
        _assert_trees_close(jax.tree.map(lambda x: x[i], p_sw), p1)


@pytest.mark.slow
def test_mesh_sharded_sweep_matches_unsharded(eight_devices):
    """8 seeds GSPMD-sharded over the 8-device mesh must equal the
    single-device vmap bit-for-tolerance; wrong seed counts get the
    friendly guard."""
    train, spec, opt, train_fn = _vision_setup()
    mesh = parallel.make_task_mesh(8, axis="seeds")
    seeds = list(range(8))
    params, opt_state, keys = parallel.stack_seed_states(
        lambda ik: models.init_cnn4(ik, spec), seeds, opt)
    sharded = parallel.vmap_seeds(train_fn, 3, 1, mesh=mesh)
    p8, _, m8 = sharded(params, opt_state, keys, train.images)
    p1, _, m1 = parallel.vmap_seeds(train_fn, 3, 1)(
        params, opt_state, keys, train.images)
    # GSPMD reorders reductions; trained params carry the f32 drift the
    # other mesh-equality tests accept (test_mesh.py:116,221).
    _assert_trees_close(p8, p1, rtol=5e-2, atol=3e-3)
    np.testing.assert_allclose(np.asarray(m8["loss"]),
                               np.asarray(m1["loss"]), rtol=2e-3, atol=1e-4)

    three = jax.tree.map(lambda x: x[:3], (params, opt_state, keys))
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        sharded(*three, train.images)


@pytest.mark.slow
def test_sweep_script_vmapped_vision(tmp_path, monkeypatch):
    """--vmap_seeds end to end: per-seed run dirs hold the metrics.json
    contract + model.npz, summary marks vmapped, band plot lands."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import sweep

    monkeypatch.chdir(tmp_path)
    # --fuse 2 over a 3-iteration budget drives the chunk loop: one
    # 2-iteration program + a 1-iteration remainder program
    # (chip_logs/r5s1: undivided full budgets crash the remote worker).
    monkeypatch.setattr(sys, "argv", [
        "sweep.py", "maml_vision", "--seeds", "42,7", "--vmap_seeds",
        "--synthetic", "--num_iterations", "3", "--meta_batch_size", "2",
        "--fuse", "2", "--compile_cache", "off",
    ])
    sweep.main()

    s = json.loads((tmp_path / "sweeps" / "maml_vision_42-7.json")
                   .read_text())
    assert s["vmapped"] is True
    assert [r["seed"] for r in s["runs"]] == [42, 7]
    assert (tmp_path / "sweeps" / "maml_vision_42-7.png").exists()
    run0 = s["runs"][0]["run_dir"]
    ms = json.loads(open(os.path.join(run0, "metrics.json")).read())
    for k in ("train_loss", "train_acc", "valid_loss", "valid_acc"):
        assert len(ms[k]) == 3   # chunks concatenate to the full budget
    assert len(ms["test_acc"]) == 1
    # the model artifact loads through the standard checkpoint loader
    from exploring_meta_tpu.utils.experiment import load_params
    spec = models.omniglot_spec(ways=5)
    template = models.init_cnn4(jax.random.key(0), spec)
    p = load_params(os.path.join(run0, "model.npz"), template)
    assert jax.tree_util.tree_structure(p) \
        == jax.tree_util.tree_structure(template)
    # and the offline eval driver accepts the run dir (logger.json
    # carries a trainer-compatible config)
    from exploring_meta_tpu.analysis import eval_vision
    out = eval_vision.run(run0, n_eval_batches=1, run_cl=False,
                          run_rc=False, synthetic=True)
    assert np.isfinite(out["test_acc"])


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["vpg", "trpo"])
def test_sweep_script_vmapped_rl(tmp_path, monkeypatch, algo):
    """Both RL chunk-driver branches (Adam-family and TRPO — different
    vmap arity, no opt_state threading on the TRPO side) run chunked:
    --fuse 2 over 3 iterations = main chunk + remainder program,
    metrics concatenated."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import sweep

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "sweep.py", f"maml_{algo}", "--seeds", "42,7", "--vmap_seeds",
        "--num_iterations", "3", "--meta_batch_size", "2",
        "--adapt_batch_size", "2", "--max_path_length", "6",
        "--n_eval_tasks", "2", "--fuse", "2", "--compile_cache", "off",
    ])
    sweep.main()

    s = json.loads((tmp_path / "sweeps" / f"maml_{algo}_42-7.json")
                   .read_text())
    assert s["vmapped"] is True
    assert all(isinstance(r["eval_reward"], float) for r in s["runs"])
    ms = json.loads(open(os.path.join(s["runs"][0]["run_dir"],
                                      "metrics.json")).read())
    assert len(ms["adapt_reward"]) == 3


def test_vmapped_rejects_serial_only_flags():
    """--resume on --vmap_seeds must fail loudly, not silently retrain
    from scratch."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from sweep import run_vmapped

    from exploring_meta_tpu.utils.config import VisionConfig
    cfg = VisionConfig(resume="results/some_run/ckpt.npz")
    with pytest.raises(SystemExit, match="cannot honor --resume"):
        run_vmapped("maml_vision", cfg, [0, 1], "/tmp/x", "test_acc")


def test_vmapped_rl_rejects_host_envs():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from sweep import _vmapped_rl

    from exploring_meta_tpu.utils.config import RLScriptConfig
    cfg = RLScriptConfig(env="AntDirection-v5")
    with pytest.raises(SystemExit, match="not a device env"):
        _vmapped_rl(cfg, "vpg", False, [0], None)
