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
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vecenv.cpp")
_LIB_CACHE: dict = {}

_c_double_p = ctypes.POINTER(ctypes.c_double)
# Indexed per-env callbacks for Python-backed physics (vecenv.cpp
# py_reset_fn / py_step_fn).
RESET_CB = ctypes.CFUNCTYPE(None, ctypes.c_int, _c_double_p, _c_double_p)
STEP_CB = ctypes.CFUNCTYPE(None, ctypes.c_int, _c_double_p, _c_double_p,
                           _c_double_p, _c_double_p, _c_double_p)


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
        # Compile to a private temp name and rename into place: os.rename
        # is atomic, so a concurrent process can never dlopen a
        # half-written .so.
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", tmp],
                check=True, capture_output=True)
            os.rename(tmp, path)
        except (subprocess.CalledProcessError, FileNotFoundError,
                OSError) as e:
            print(f"native vecenv unavailable ({e}); using Python paths",
                  file=sys.stderr)
            if os.path.exists(tmp):
                os.remove(tmp)
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
    lib.vecenv_create_python.restype = ctypes.c_void_p
    lib.vecenv_create_python.argtypes = [RESET_CB, STEP_CB, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int]
    lib.vecenv_create_busy.restype = ctypes.c_void_p
    lib.vecenv_create_busy.argtypes = [ctypes.c_int, ctypes.c_int,
                                       ctypes.c_double, ctypes.c_int]
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
                 n_threads: int | None = None, busy_us: float = 0.0,
                 busy_spin: bool = False):
        self._lib = load_vecenv_library()
        if self._lib is None:
            raise RuntimeError("native vecenv library unavailable")
        threads = n_threads if n_threads is not None else min(
            n_envs, os.cpu_count() or 1)
        if env_type == "particles2d":
            self._h = self._lib.vecenv_create_particles2d(n_envs, threads)
        elif env_type == "busy":
            # synthetic pool-scaling benchmark env (vecenv.cpp BusyState):
            # each step costs busy_us of C-side simulated physics — sleep
            # (blocking, core-free) or spin (core-burning)
            self._h = self._lib.vecenv_create_busy(n_envs, threads,
                                                   float(busy_us),
                                                   int(busy_spin))
        else:
            raise ValueError(f"unknown native env {env_type!r}")
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
        # Validate before handing pointers to C: the native side indexes
        # tasks[i] for every env unless task_rows == 1 (broadcast), so a
        # wrong shape would be an out-of-bounds read, not a Python error.
        if tasks.shape[0] not in (1, self.n_envs):
            raise ValueError(f"tasks rows must be 1 or n_envs "
                             f"({self.n_envs}), got {tasks.shape[0]}")
        if tasks.shape[1] != 2:  # particles2d goal dim
            raise ValueError(f"particles2d tasks need dim 2, "
                             f"got {tasks.shape[1]}")
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        self._lib.vecenv_reset(self._h, _ptr(tasks), tasks.shape[0],
                               tasks.shape[1], _ptr(obs))
        return obs

    def step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, np.float64)
        # validate BEFORE handing the pointer to C: the native side reads
        # actions + i*action_size for every env — a wrong shape would be
        # an out-of-bounds read, not a Python error
        if actions.shape != (self.n_envs, self.action_size):
            raise ValueError(f"actions must be [{self.n_envs}, "
                             f"{self.action_size}], got {actions.shape}")
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        rew = np.empty(self.n_envs, np.float64)
        done = np.empty(self.n_envs, np.float64)
        suc = np.empty(self.n_envs, np.float64)
        self._lib.vecenv_step(self._h, _ptr(actions), _ptr(obs), _ptr(rew),
                              _ptr(done), _ptr(suc))
        return obs, rew, done, suc


class PythonEnvPool:
    """C++ thread pool stepping PYTHON env objects (MuJoCo / Meta-World).

    The batch fan-out, worker threads and completion barrier live in C++
    (``vecenv_create_python``); each env's physics is re-entered through a
    ctypes callback. MuJoCo releases the GIL inside ``mj_step``, so env
    steps overlap across pool threads — the in-process, TPU-host analog of
    l2l's ``AsyncVectorEnv`` subprocess pool (reference
    ``utils/env_maker.py:18-21``), without pipes or pickling.

    Envs must follow the host-env protocol of envs/host.py:
    ``reset(seed=) -> obs`` and ``step(a) -> (obs, r, done, trunc, suc)``.
    """

    def __init__(self, envs: list, n_threads: int | None = None):
        self._lib = load_vecenv_library()
        if self._lib is None:
            raise RuntimeError("native vecenv library unavailable")
        self.envs = envs
        self.n_envs = len(envs)
        e = envs[0]
        self.obs_size = int(e.obs_size)
        self.action_size = int(e.action_size)
        self._reset_seed = None
        self._error = None

        def _reset_cb(i, task_ptr, obs_ptr):
            try:
                # per-slot seed offsets (gym AsyncVectorEnv semantics):
                # a shared seed would put every slot's np_random in lockstep
                s = None if self._reset_seed is None else self._reset_seed + i
                obs = np.ascontiguousarray(self.envs[i].reset(seed=s),
                                           np.float64)
                if obs.size != self.obs_size:  # memmove would read OOB
                    raise ValueError(f"env {i} reset obs size {obs.size} "
                                     f"!= {self.obs_size}")
                ctypes.memmove(obs_ptr, obs.ctypes.data, 8 * self.obs_size)
            except BaseException as exc:  # ctypes swallows exceptions
                self._error = exc

        def _step_cb(i, act_ptr, obs_ptr, rew_ptr, done_ptr, suc_ptr):
            try:
                action = np.ctypeslib.as_array(act_ptr,
                                               (self.action_size,))
                obs, rew, done, _trunc, suc = self.envs[i].step(action)
                obs = np.ascontiguousarray(obs, np.float64)
                if obs.size != self.obs_size:  # memmove would read OOB
                    raise ValueError(f"env {i} step obs size {obs.size} "
                                     f"!= {self.obs_size}")
                ctypes.memmove(obs_ptr, obs.ctypes.data, 8 * self.obs_size)
                rew_ptr[0] = float(rew)
                done_ptr[0] = 1.0 if done else 0.0
                suc_ptr[0] = float(suc)
            except BaseException as exc:
                self._error = exc

        # Keep CFUNCTYPE wrappers alive for the pool's lifetime (GC'ing
        # them while C++ holds the raw pointer is a segfault).
        self._reset_cb = RESET_CB(_reset_cb)
        self._step_cb = STEP_CB(_step_cb)
        threads = n_threads if n_threads is not None else min(
            self.n_envs, os.cpu_count() or 1)
        self._h = self._lib.vecenv_create_python(
            self._reset_cb, self._step_cb, self.obs_size, self.action_size,
            self.n_envs, threads)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.vecenv_destroy(self._h)
            self._h = None

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def reset(self, seed: int | None = None) -> np.ndarray:
        self._reset_seed = seed
        dummy = np.zeros((1, 1), np.float64)  # tasks set Python-side
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        self._lib.vecenv_reset(self._h, _ptr(dummy), 1, 1, _ptr(obs))
        self._check()
        return obs

    def step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, np.float64)
        # validate BEFORE handing the pointer to C: the native side reads
        # actions + i*action_size for every env — a wrong shape would be
        # an out-of-bounds read, not a Python error
        if actions.shape != (self.n_envs, self.action_size):
            raise ValueError(f"actions must be [{self.n_envs}, "
                             f"{self.action_size}], got {actions.shape}")
        obs = np.empty((self.n_envs, self.obs_size), np.float64)
        rew = np.empty(self.n_envs, np.float64)
        done = np.empty(self.n_envs, np.float64)
        suc = np.empty(self.n_envs, np.float64)
        self._lib.vecenv_step(self._h, _ptr(actions), _ptr(obs), _ptr(rew),
                              _ptr(done), _ptr(suc))
        self._check()
        return obs, rew, done, suc
