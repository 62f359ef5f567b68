"""Native (C++) runtime components, bound via ctypes.

``vecenv`` — the threaded vectorized env-stepping service (see
vecenv.cpp). Compiled on first use with g++ into a cached shared
library; absence of a toolchain degrades gracefully to the pure-Python
paths (everything in the framework has one).
"""

from exploring_meta_tpu.native.binding import (
    load_vecenv_library,
    NativeVecEnv,
    native_available,
)

__all__ = ["load_vecenv_library", "NativeVecEnv", "native_available"]
