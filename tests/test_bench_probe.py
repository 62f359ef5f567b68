"""bench.py tunnel probe: a down tunnel must yield a bounded, honest
error line — never an unbounded hang (the axon failure mode is a hang
inside ``jax.devices()``, not an exception; a hung driver bench run
would leave the round with no BENCH artifact at all)."""

import importlib.util
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tunnel_up_true_on_success(monkeypatch):
    bench = _load_bench()

    class R:
        returncode = 0

    # tunnel_up imports subprocess locally; patching the stdlib module
    # object covers it.
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    assert bench.tunnel_up(timeout_s=1) is True


def test_tunnel_up_false_on_timeout(monkeypatch):
    bench = _load_bench()

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench.tunnel_up(timeout_s=1) is False


def test_down_tunnel_emits_error_line_fast():
    """End-to-end: EMT_BENCH_PROBE_TIMEOUT=0.01 kills the probe child
    before it can even import jax (safe whether or not the real tunnel is
    up), so bench must print exactly one JSON line flagged with an error
    and exit 0 — the driver's one-line contract, bounded."""
    env = dict(os.environ, EMT_BENCH_PROBE_TIMEOUT="0.01")
    env.pop("EMT_FORCE_CPU", None)
    env.pop("EMT_BENCH_NO_PROBE", None)
    out = subprocess.run([sys.executable, BENCH, "--config", "maml_omni"],
                         capture_output=True, text=True, env=env,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_tunnel_down"
    assert rec["value"] == 0.0
    assert rec["metric"] == "maml_omniglot_5w5s_cnn4_meta_train"


def test_down_tunnel_all_mode_labels_every_config():
    """--all + down tunnel: one error line PER config (none mislabeled as
    the headline), nonzero exit for chip_queue's log, and the on-chip
    BENCH_FULL.json record untouched."""
    bench = _load_bench()
    repo = os.path.dirname(os.path.abspath(BENCH))
    full = os.path.join(repo, "BENCH_FULL.json")
    before = open(full).read() if os.path.exists(full) else None
    env = dict(os.environ, EMT_BENCH_PROBE_TIMEOUT="0.01")
    env.pop("EMT_FORCE_CPU", None)
    env.pop("EMT_BENCH_NO_PROBE", None)
    out = subprocess.run([sys.executable, BENCH, "--all"],
                         capture_output=True, text=True, env=env,
                         timeout=120)
    assert out.returncode == 1, (out.returncode, out.stderr[-500:])
    recs = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert {r["config"] for r in recs} == set(bench.CONFIGS)
    assert all(r["error"] == "tpu_tunnel_down" for r in recs)
    after = open(full).read() if os.path.exists(full) else None
    assert after == before


def test_config_registry_contract():
    """Every CONFIGS row carries the four keys run_config consumes;
    every _BASELINE_ALIAS points at a real config; the fast-TRPO row
    shares the reference-exact torch denominator (the reference
    computation does not change with --bf16/--fuse, so the two rows
    must divide by the SAME cache entry)."""
    bench = _load_bench()
    for name, cfg in bench.CONFIGS.items():
        for k in ("metric", "unit", "measure", "baseline"):
            assert k in cfg, (name, k)
        assert callable(cfg["measure"]) and callable(cfg["baseline"])
    for alias, target in bench._BASELINE_ALIAS.items():
        assert alias in bench.CONFIGS and target in bench.CONFIGS
    assert bench._BASELINE_ALIAS["trpo_particles_fast"] == "trpo_particles"
    assert "trpo_particles" in bench._TORCH_BASELINES
    # aliased rows must also share the measurement function's denominator
    assert (bench.CONFIGS["trpo_particles_fast"]["baseline"]
            is bench.CONFIGS["trpo_particles"]["baseline"])
