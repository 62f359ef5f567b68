"""Persistent XLA compilation cache (fresh-process startup cost killer).

The reference stack has no analog: torch eager pays no compile cost. On
TPU, every jitted program is compiled by XLA at first dispatch — through
this image's remote runtime that costs 20 s for small programs and tens
of minutes for the big fused/bf16 train scans (BASELINE.md). JAX's
persistent compilation cache serializes compiled executables keyed on
(HLO, compile options, runtime version), so a re-run, a resumed run, or
an eval process over the same program skips straight to execution.

``enable_compile_cache`` is wired into every trainer/analysis script via
the ``--compile_cache`` flag (default: ON, at
``~/.cache/exploring_meta_tpu/xla``; pass ``--compile_cache off`` to
disable, or a path to relocate). Cache misses/hits can be audited with
``JAX_EXPLAIN_CACHE_MISSES=1``.

Safe-by-construction: entries are keyed on the exact HLO + jaxlib +
runtime version, so stale entries can't be loaded; on backends whose
runtime does not support executable serialization JAX falls back to
compiling (warnings only — ``jax_raise_persistent_cache_errors`` stays
False).
"""

from __future__ import annotations

import os

_OFF = ("off", "none", "0", "false")


def enable_compile_cache(path: str | None = None, *,
                         min_compile_secs: float = 1.0) -> str | None:
    """Turn on JAX's persistent compilation cache.

    ``path``: cache directory; ``None``/"" uses ``$EMT_COMPILE_CACHE`` or
    ``~/.cache/exploring_meta_tpu/xla``; the strings "off"/"none"/"0"
    disable and return None. Programs cheaper than ``min_compile_secs``
    to compile are not persisted (they recompile faster than they
    deserialize). Returns the directory in use.
    """
    if path is not None and path.strip().lower() in _OFF:
        return None
    if not path:
        path = os.environ.get("EMT_COMPILE_CACHE", "")
        if path.strip().lower() in _OFF:
            return None
    # EMT_FORCE_CPU must win before any backend decision here — callers
    # (serve scripts, Experiment) may invoke this before their own
    # platform forcing, and jax ignores platform changes after init.
    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()

    import jax
    if not path:
        # Default-on only for the accelerator backend. XLA:CPU cache
        # entries are AOT machine code whose cache key does NOT include
        # the host's CPU features — with this image's remote compile
        # service the compile machine differs from the execution host
        # (cpu_aot_loader warns about possible SIGILL when loading such
        # entries). An explicit --compile_cache path still opts in on CPU.
        # The platform check reads config/env only — it must NOT call
        # jax.default_backend(), which would initialize the backend (and
        # with it the TPU tunnel) just to decide cache policy.
        platforms = (jax.config.jax_platforms or "").lower()
        if platforms.split(",")[0] == "cpu":
            return None
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "exploring_meta_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    # jax latches the first cache directory it initializes with
    # (compilation_cache._cache_initialized) and silently ignores later
    # jax_compilation_cache_dir updates — re-pointing mid-process (e.g.
    # a script enabling its own dir after the test conftest or another
    # entry point already used one) must drop the latch first. The latch
    # is the module globals, NOT the config value (the config dir can be
    # nulled while the latched cache object lives on), so inspect those.
    # These are jax._src private internals; the getattr guards keep a
    # future rename from crashing, and tests/test_compile_cache.py::
    # test_repoint_drops_latch fails loudly if a rename silently
    # disables the reset (reverting to the stale-dir bug).
    from jax._src import compilation_cache as _cc
    _latched = getattr(_cc, "_cache", None)
    if getattr(_cc, "_cache_initialized", False) or _latched is not None:
        _latched_path = (str(getattr(_latched, "_path", ""))
                         if _latched is not None else None)
        # realpath both sides: trailing slashes / relative segments /
        # symlinks to the same dir are the SAME cache (a mismatch here
        # only costs a harmless reset, but spurious resets drop the
        # in-memory latch every call).
        if (_latched_path is None
                or os.path.realpath(_latched_path) != os.path.realpath(path)):
            _cc.reset_cache()
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
