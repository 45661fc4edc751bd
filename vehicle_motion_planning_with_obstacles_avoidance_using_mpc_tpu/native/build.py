"""Build-on-first-use loader for the native A* shared library.

Compiles ``astar.cpp`` with g++ into the package directory the first
time it is needed (a few hundred ms, cached by mtime), then loads it via
ctypes. No pybind11 dependency — the ABI is plain C.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "astar.cpp")
_LIB = os.path.join(_DIR, "libastar.so")
_lock = threading.Lock()
_cached = None
_failed = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # -march=native can be unsupported in odd environments
            subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                            "-o", _LIB, _SRC],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def load_native_astar():
    """The loaded ctypes library, or None when build/load fails."""
    global _cached, _failed
    with _lock:
        if _cached is not None:
            return _cached
        if _failed:
            return None
        if _needs_build() and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.astar_solve.restype = ctypes.c_int
        lib.astar_solve.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.astar_solve_batch.restype = None
        lib.astar_solve_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _cached = lib
        return lib


def native_available() -> bool:
    return load_native_astar() is not None
