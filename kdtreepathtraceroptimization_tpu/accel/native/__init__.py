"""ctypes binding for the native KD builder (kdbuild.cpp).

Compiles the shared library on demand with g++ -O3 (no pybind11 in the
image; plain C ABI + ctypes per the environment constraints). Falls
back cleanly if no compiler is available — accel.kdtree picks the
numpy builder in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kdbuild.cpp")
_LIB = os.path.join(_HERE, "libkdbuild.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_native():
    """Return the loaded CDLL or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        lib_ok = os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime
        if not lib_ok and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_f32p = ctypes.POINTER(ctypes.c_float)

        lib.kd_build.restype = ctypes.c_void_p
        lib.kd_build.argtypes = [
            c_f32p, c_f32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ]
        lib.kd_node_count.restype = ctypes.c_int64
        lib.kd_node_count.argtypes = [ctypes.c_void_p]
        lib.kd_tri_count.restype = ctypes.c_int64
        lib.kd_tri_count.argtypes = [ctypes.c_void_p]
        lib.kd_max_depth.restype = ctypes.c_int32
        lib.kd_max_depth.argtypes = [ctypes.c_void_p]
        lib.kd_export.restype = None
        lib.kd_export.argtypes = [
            ctypes.c_void_p,
            c_i32p, c_f32p, c_f32p, c_f32p,
            c_i32p, c_i32p, c_i32p, c_i32p, c_i32p, c_i32p,
            c_i64p, c_f32p, c_f32p,
        ]
        lib.kd_free.restype = None
        lib.kd_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
