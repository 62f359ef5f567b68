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


def test_repoint_drops_latch(tmp_path):
    """Re-pointing the cache dir mid-process must take effect: jax
    latches the first directory (compilation_cache._cache_initialized)
    and silently ignores later config updates, so enable_compile_cache
    resets the latch via jax._src internals. This test fails LOUDLY if a
    jax rename makes that reset a silent no-op (the getattr guards would
    otherwise revert to the stale-dir bug)."""
    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")

    @jax.jit
    def f(v):
        return (v * 3 - 1).sum()

    enable_compile_cache(d1, min_compile_secs=0.0)
    float(f(jax.numpy.arange(32.0)))
    assert len(os.listdir(d1)) >= 1

    # equivalent-but-unnormalized spelling of d1 must NOT reset the latch
    from jax._src import compilation_cache as _cc
    enable_compile_cache(d1 + os.sep, min_compile_secs=0.0)
    assert getattr(_cc, "_cache", None) is not None, \
        "latch reset fired on an equivalent path spelling"

    enable_compile_cache(d2, min_compile_secs=0.0)
    float(f(jax.numpy.arange(48.0)))  # new shape -> fresh compile
    assert len(os.listdir(d2)) >= 1, \
        "re-pointed cache dir received no entries — the jax latch reset " \
        "(jax._src.compilation_cache internals) has gone stale"


def test_experiment_respects_off(tmp_path, monkeypatch):
    """Experiment.__init__ routes its config's compile_cache through."""
    monkeypatch.setenv("EMT_COMPILE_CACHE", "off")
    from exploring_meta_tpu.utils.experiment import Experiment
    monkeypatch.chdir(tmp_path)
    Experiment("algo", "ds", {"compile_cache": ""}, path=str(tmp_path) + "/")
    assert not jax.config.jax_enable_compilation_cache
