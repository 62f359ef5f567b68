"""Persistent compilation cache plumbing (utils/compile_cache.py).

The cross-process hit itself is exercised manually (BASELINE.md records
the measured fresh-process win on the real chip); here we pin the config
plumbing: off-switches, directory resolution, and that a jitted program
actually lands entries in the cache directory on the CPU backend.
"""

import os

import jax
import pytest

from exploring_meta_tpu.utils.compile_cache import enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """Leave the session's cache config the way the suite expects (off)."""
    yield
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_compilation_cache_dir", None)


def test_off_values_disable():
    for v in ("off", "OFF", "none", "0", "false", " off "):
        assert enable_compile_cache(v) is None


def test_env_var_off(monkeypatch):
    monkeypatch.setenv("EMT_COMPILE_CACHE", "off")
    assert enable_compile_cache("") is None
    assert enable_compile_cache(None) is None


def test_explicit_path_wins_over_env(tmp_path, monkeypatch):
    monkeypatch.setenv("EMT_COMPILE_CACHE", "off")
    d = str(tmp_path / "cache")
    assert enable_compile_cache(d) == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_enable_compilation_cache


def test_env_var_path(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("EMT_COMPILE_CACHE", d)
    assert enable_compile_cache("") == d
    assert os.path.isdir(d)


def test_default_off_on_cpu_backend(monkeypatch, tmp_path):
    """The default-on location applies only to the accelerator backend:
    XLA:CPU AOT entries aren't keyed on host CPU features and the remote
    compile service's machine differs from this host (SIGILL hazard), so
    with no explicit path the CPU backend gets no persistent cache."""
    monkeypatch.delenv("EMT_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    assert jax.default_backend() == "cpu"  # the suite runs on CPU
    assert enable_compile_cache(None) is None
    assert not os.path.isdir(
        tmp_path / ".cache" / "exploring_meta_tpu" / "xla")


def test_jit_writes_entries(tmp_path):
    """A compiled program is persisted into the cache directory."""
    d = str(tmp_path / "jitcache")
    enable_compile_cache(d, min_compile_secs=0.0)
    x = jax.numpy.arange(64.0)

    @jax.jit
    def f(v):
        return (v * 2 + 1).sum()

    float(f(x))
    assert len(os.listdir(d)) >= 1


def test_experiment_respects_off(tmp_path, monkeypatch):
    """Experiment.__init__ routes its config's compile_cache through."""
    monkeypatch.setenv("EMT_COMPILE_CACHE", "off")
    from exploring_meta_tpu.utils.experiment import Experiment
    monkeypatch.chdir(tmp_path)
    Experiment("algo", "ds", {"compile_cache": ""}, path=str(tmp_path) + "/")
    assert not jax.config.jax_enable_compilation_cache
