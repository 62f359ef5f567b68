"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware by forcing the
CPU backend to expose 8 XLA devices (SURVEY.md §4d).

This environment pre-imports jax at interpreter startup (axon
sitecustomize via PYTHONPATH) with JAX_PLATFORMS=axon, so env vars set
here are too late for jax's import-time config — but the XLA backend is
not yet initialized when conftest loads, so ``jax.config.update`` plus an
XLA_FLAGS env tweak still take effect.
"""

import os

import jax
import pytest

# Default the package-level compile cache off; the CPU branch below
# re-points it (and raw-jax subprocesses) at the shared suite cache —
# but an EXPLICIT user EMT_COMPILE_CACHE (e.g. =off to bisect cache
# bugs) always wins over the suite default.
_user_cache = "EMT_COMPILE_CACHE" in os.environ
os.environ.setdefault("EMT_COMPILE_CACHE", "off")

if os.environ.get("EMT_TEST_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
    # Suite-local persistent XLA cache: the handful of fused-trainer/mesh
    # tests each burn 20-60 s compiling the same big CPU programs every
    # run. Unlike the package default (off on CPU because the axon REMOTE
    # compile service produces AOT code for a different machine), tests
    # compile in-process on this host, so cached entries are safe to
    # reload. Tiny programs stay uncached (min_compile_time_secs) — they
    # recompile faster than they deserialize. Delete .pytest_xla_cache/
    # to measure cold-compile behavior.
    if os.environ.get("EMT_TEST_COMPILE_CACHE", "1") == "1":
        _cache_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir,
                         ".pytest_xla_cache"))
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # Subprocess-spawned scripts (roofline/sweep/trainer CLIs) must
        # share the cache too — they re-compile the very biggest programs
        # otherwise. EMT_COMPILE_CACHE feeds enable_compile_cache-aware
        # entry points; the JAX_* vars cover scripts that configure jax
        # directly.
        if not _user_cache:
            os.environ["EMT_COMPILE_CACHE"] = _cache_dir
        os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
        os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "2.0"
        os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
# EMT_TEST_TPU=1 runs the suite on the real TPU backend instead (used for
# the TPU-only Pallas kernel tests; run those alone — the tunnel is slow).


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end trainer/eval tests (minutes); "
        "deselect with -m 'not slow' for the quick loop")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


@pytest.fixture
def fake_metaworld():
    """Inject tests.fake_metaworld as the `metaworld` package so the
    Meta-World adapter's task-sampling/set_task/step/horizon-done logic
    executes without the real (uninstallable here) dependency."""
    import sys
    import fake_metaworld as fake  # tests/ is on sys.path (pytest rootdir)

    had = "metaworld" in sys.modules
    prev = sys.modules.get("metaworld")
    sys.modules["metaworld"] = fake
    try:
        yield fake
    finally:
        if had:
            sys.modules["metaworld"] = prev
        else:
            del sys.modules["metaworld"]
