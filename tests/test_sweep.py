"""Multi-seed sweep driver (scripts/sweep.py): runs N seeded trainers
in-process, writes sweep_summary json + confidence-band plot."""

import json
import os
import sys

import pytest


@pytest.mark.slow
def test_vision_sweep_end_to_end(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import sweep

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "sweep.py", "maml_vision", "--seeds", "42,7", "--synthetic",
        "--num_iterations", "2", "--meta_batch_size", "2",
        "--save_every", "10", "--compile_cache", "off",
    ])
    sweep.main()

    out = tmp_path / "sweeps" / "maml_vision_42-7.json"
    s = json.loads(out.read_text())
    assert [r["seed"] for r in s["runs"]] == [42, 7]
    assert all(os.path.isdir(r["run_dir"]) for r in s["runs"])
    assert s["metric"] == "test_acc"
    assert isinstance(s["mean"], float) and isinstance(s["std"], float)
    assert s["band_metric"] == "valid_acc"
    assert (tmp_path / "sweeps" / "maml_vision_42-7.png").exists()
    # each run dir holds the usual artifact contract
    run0 = s["runs"][0]["run_dir"]
    assert os.path.exists(os.path.join(run0, "metrics.json"))
    assert os.path.exists(os.path.join(run0, "logger.json"))


@pytest.mark.slow
def test_rl_sweep_end_to_end(tmp_path, monkeypatch):
    """The RL table entries share one code path; drive the cheapest
    (vpg, no CG) at tiny shapes so the rl branch can't rot untested."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import sweep

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "sweep.py", "maml_vpg", "--seeds", "42,7",
        "--num_iterations", "2", "--meta_batch_size", "2",
        "--adapt_batch_size", "2", "--max_path_length", "6",
        "--n_eval_tasks", "2", "--save_every", "10",
        "--compile_cache", "off",
    ])
    sweep.main()

    out = tmp_path / "sweeps" / "maml_vpg_42-7.json"
    s = json.loads(out.read_text())
    assert [r["seed"] for r in s["runs"]] == [42, 7]
    assert s["metric"] == "eval_reward"
    assert all(isinstance(r["eval_reward"], float) for r in s["runs"])
    assert (tmp_path / "sweeps" / "maml_vpg_42-7.png").exists()


def test_unknown_algo_errors(monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import sweep
    monkeypatch.setattr(sys, "argv", ["sweep.py", "nope"])
    with pytest.raises(SystemExit):
        sweep.main()
