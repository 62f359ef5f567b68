"""Roofline reporter (scripts/roofline.py): cost-analysis fields present
and the conv-lowering/--bf16 knobs change the compiled program's costs."""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "roofline.py")


def _run(*flags):
    env = dict(os.environ, EMT_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, SCRIPT, "--meta_batch", "2", *flags],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _gflop(text):
    line = next(l for l in text.splitlines() if l.startswith("per program"))
    return float(line.split()[2])


@pytest.mark.slow
def test_reports_costs_and_regime():
    text = _run("--config", "maml_omni", "--mem")
    assert "GFLOP" in text and "GB accessed" in text
    assert "arithmetic intensity" in text
    assert "bandwidth-bound regime" in text  # CNN4 meta-step is memory-bound
    assert "roofline bound" in text
    # --mem: XLA memory_analysis physical buffer report + the
    # physical/logical argument padding multiplier (residual instrument)
    assert "memory_analysis (physical)" in text
    assert "argument padding multiplier" in text


@pytest.mark.slow
def test_maml_min_config():
    # The heaviest vision config (full-body inner loop, 84x84x3): it must
    # build, report, and cost strictly more FLOPs per task than maml_omni
    # (28x28x1 images) at the same meta-batch.
    text = _run("--config", "maml_min")
    assert "GFLOP" in text and "roofline bound" in text
    assert _gflop(text) > _gflop(_run("--config", "maml_omni"))


@pytest.mark.slow
def test_trpo_config_scan_body_scaling():
    # RL flagship config: compiles and reports, and the program-level
    # numbers are the per-iteration (scan-body-once) costs x fuse.
    text = _run("--config", "trpo_particles", "--fuse", "3")
    assert "scan body x 3" in text
    prog = _gflop(text)
    it = float(next(l for l in text.splitlines()
                    if l.startswith("per iteration")).split()[2])
    assert prog == pytest.approx(3 * it, rel=1e-3)


@pytest.mark.slow
def test_knobs_change_compiled_costs():
    base = _gflop(_run("--config", "maml_omni"))
    s2d = _gflop(_run("--config", "maml_omni", "--conv_impl", "s2d"))
    # s2d trades 16/9 the conv MACs for MXU-shaped reductions
    assert s2d > base * 1.2
