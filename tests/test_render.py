"""Renderer smoke tests (reference misc_scripts/render_metaworld.py).

No GL stack exists in this image (verified: glfw/egl/osmesa all fail), so
these drive the script's rollout + graceful-degradation path: policy
reload, host-env rollout, per-episode returns, no crash when frames are
unavailable.
"""

import json
import os
import runpy
import sys

import numpy as np
import jax
import pytest


def _make_run_dir(tmp_path, env_name, obs, act, max_path_length=10):
    from exploring_meta_tpu.models import DiagNormalPolicy
    from exploring_meta_tpu.utils.experiment import flatten_params

    policy = DiagNormalPolicy(input_size=obs, output_size=act)
    params = policy.init(jax.random.key(0))
    run = tmp_path / "run"
    run.mkdir()
    np.savez(run / "model.npz", **flatten_params(params))
    with open(run / "logger.json", "w") as f:
        json.dump({"config": {"algo": "maml_ppo", "dataset": env_name,
                              "seed": 0,
                              "max_path_length": max_path_length}}, f)
    return str(run)


def _run_script(argv):
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "scripts", "render_metaworld.py")
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = old


def test_render_script_ant(tmp_path, capsys):
    run = _make_run_dir(tmp_path, "AntDirection-v1", obs=105, act=8)
    _run_script([run, "--episodes", "1"])
    out = capsys.readouterr().out
    assert "episode 0: return" in out


def test_render_script_ml10(fake_metaworld, tmp_path, capsys):
    run = _make_run_dir(tmp_path, "ML10", obs=9, act=4, max_path_length=6)
    _run_script([run, "--episodes", "2"])
    out = capsys.readouterr().out
    assert "episode 1: return" in out


def test_render_script_rejects_device_env(tmp_path):
    run = _make_run_dir(tmp_path, "Particles2D-v1", obs=2, act=2)
    with pytest.raises(SystemExit, match="host physics"):
        _run_script([run, "--episodes", "1"])
