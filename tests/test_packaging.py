"""Packaging contract: pyproject parses, console entry points resolve,
and the CLI shims under scripts/ point at the same functions.

The full ``pip install -e .`` smoke test needs pip and is run manually
(CLAUDE.md); these tests pin everything that can rot without network:
entry-point paths, shim imports, and the dependency names being real
importable modules in this image.
"""

import importlib
import os
import tomllib

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) >= 11
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), f"{name} -> {target}"


def test_core_dependencies_importable():
    deps = _pyproject()["project"]["dependencies"]
    for dep in deps:
        mod = dep.split(">=")[0].split("==")[0].strip()
        importlib.import_module(mod)


def test_package_data_ships_native_source():
    pd = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pd["exploring_meta_tpu.native"]
    assert os.path.exists(os.path.join(
        REPO, "exploring_meta_tpu", "native", "vecenv.cpp"))


def test_cli_shims_reference_cli_module():
    """Every thin script shim imports its main from exploring_meta_tpu.cli
    (one implementation, two invocation paths)."""
    for script in ("maml_vision", "anil_vision", "maml_trpo", "anil_trpo",
                   "maml_ppo", "anil_ppo", "maml_vpg", "anil_vpg",
                   "eval_vision", "eval_rl", "pack_datasets"):
        path = os.path.join(REPO, "scripts", f"{script}.py")
        with open(path) as f:
            src = f.read()
        assert "from exploring_meta_tpu.cli import" in src, script
