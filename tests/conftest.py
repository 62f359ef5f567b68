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
    #
    # Resolution order: an explicit user EMT_COMPILE_CACHE wins everywhere
    # — "off" disables caching for the WHOLE suite (in-process AND the
    # JAX_* vars subprocess scripts read; a half-cached bisect is worse
    # than either extreme), a user dir is used as-is. Otherwise
    # EMT_TEST_COMPILE_CACHE=0 disables, default is the suite-local dir.
    if _user_cache:
        _cache_dir = os.environ["EMT_COMPILE_CACHE"]
        if _cache_dir.strip().lower() in ("off", "none", "0", ""):
            # Normalize in the env too: subprocess CLIs read the var
            # through enable_compile_cache, where "" means "use the
            # default dir" — leaving it would produce exactly the
            # half-cached (in-process off, subprocess on) split this
            # block exists to prevent.
            os.environ["EMT_COMPILE_CACHE"] = "off"
            _cache_dir = ""
    elif os.environ.get("EMT_TEST_COMPILE_CACHE", "1") == "1":
        _cache_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir,
                         ".pytest_xla_cache"))
        # EMT_COMPILE_CACHE feeds enable_compile_cache-aware entry points
        # (subprocess-spawned roofline/sweep/trainer CLIs re-compile the
        # very biggest programs otherwise).
        os.environ["EMT_COMPILE_CACHE"] = _cache_dir
    else:
        _cache_dir = ""
    if _cache_dir:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # The JAX_* vars cover subprocess scripts that configure jax
        # directly rather than through enable_compile_cache.
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
