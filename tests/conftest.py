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

# Tests never use the persistent compile cache (Experiment turns it on by
# default): CPU AOT cache loads warn loudly on machine-feature mismatches
# and tiny test programs recompile faster than they deserialize.
os.environ.setdefault("EMT_COMPILE_CACHE", "off")

if os.environ.get("EMT_TEST_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
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
