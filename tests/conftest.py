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

if os.environ.get("EMT_TEST_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
# EMT_TEST_TPU=1 runs the suite on the real TPU backend instead (used for
# the TPU-only Pallas kernel tests; run those alone — the tunnel is slow).


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
