"""ctypes binding for the native vecenv rollout service (vecenv.cpp).

Builds the shared library on first use (g++ -O3, cached beside the
source; rebuilt when the source changes). pybind11 is not in this image,
so the boundary is a plain C ABI with numpy buffers passed by pointer —
one crossing per batched step, zero copies.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vecenv.cpp")
_LIB_CACHE: dict = {}


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libvecenv_{digest}.so")


def load_vecenv_library() -> ctypes.CDLL | None:
    """Compile (if needed) and load the native library; None if no g++."""
    path = _lib_path()
    if path in _LIB_CACHE:
        return _LIB_CACHE[path]
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", path],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native vecenv unavailable ({e}); using Python paths")
            _LIB_CACHE[path] = None
            return None
    lib = ctypes.CDLL(path)
    c_double_p = ctypes.POINTER(ctypes.c_double)
    lib.vecenv_create_particles2d.restype = ctypes.c_void_p
    lib.vecenv_create_particles2d.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.vecenv_destroy.argtypes = [ctypes.c_void_p]
    lib.vecenv_obs_size.argtypes = [ctypes.c_void_p]
    lib.vecenv_obs_size.restype = ctypes.c_int
    lib.vecenv_action_size.argtypes = [ctypes.c_void_p]
    lib.vecenv_action_size.restype = ctypes.c_int
    lib.vecenv_reset.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                 ctypes.c_int, c_double_p]
    lib.vecenv_step.argtypes = [ctypes.c_void_p] + [c_double_p] * 5
    _LIB_CACHE[path] = lib
    return lib


def native_available() -> bool:
    return load_vecenv_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeVecEnv:
    """Python handle over the C++ thread-pool stepper.

    Drop-in peer of envs.host.HostVecEnv for envs implemented natively
    (built-in: particles2d). Batched step = one ctypes call.
    """

    def __init__(self, env_type: str = "particles2d", n_envs: int = 16,
                 n_threads: int | None = None):
        self._lib = load_vecenv_library()
        if self._lib is None:
            raise RuntimeError("native vecenv library unavailable")
        if env_type != "particles2d":
            raise ValueError(f"unknown native env {env_type!r}")
        threads = n_threads if n_threads is not None else min(
            n_envs, os.cpu_count() or 1)
        self._h = self._lib.vecenv_create_particles2d(n_envs, threads)
        self.n_envs = n_envs
        self.obs_size = self._lib.vecenv_obs_size(self._h)
        self.action_size = self._lib.vecenv_action_size(self._h)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.vecenv_destroy(self._h)
            self._h = None

    def reset(self, tasks: np.ndarray) -> np.ndarray:
        tasks = np.ascontiguousarray(tasks, np.float64)
        if tasks.ndim == 1:
            tasks = tasks[None]
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        self._lib.vecenv_reset(self._h, _ptr(tasks), tasks.shape[0],
                               tasks.shape[1], _ptr(obs))
        return obs

    def step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, np.float64)
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        rew = np.empty(self.n_envs, np.float64)
        done = np.empty(self.n_envs, np.float64)
        suc = np.empty(self.n_envs, np.float64)
        self._lib.vecenv_step(self._h, _ptr(actions), _ptr(obs), _ptr(rew),
                              _ptr(done), _ptr(suc))
        return obs, rew, done, suc
