"""ctypes binding for the native C++/OpenMP MAS kernel (native/mas/mas.cpp).

Compiled on first use with g++ and cached next to the source. This is the
host-CPU fast path (e.g. offline alignment extraction) and the parity
oracle for the on-device implementations.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "mas", "mas.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "mas", "libmas.so")

_lock = threading.Lock()
_lib = None


def _build_lib() -> None:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build_lib()
            lib = ctypes.CDLL(_LIB)
            lib.maximum_path_c.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.maximum_path_c.restype = None
            _lib = lib
    return _lib


def maximum_path_cpp(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Batched MAS on the host CPU.

    Args:
        value: (B, T_x, T_y) float log-prior grid (numpy).
        mask: (B, T_x, T_y) 0/1 mask (numpy).

    Returns:
        (B, T_x, T_y) float32 binary alignment path.
    """
    lib = _get_lib()
    value = np.ascontiguousarray(np.asarray(value, dtype=np.float32) * np.asarray(mask, dtype=np.float32))
    B, T_x, T_y = value.shape
    paths = np.zeros((B, T_x, T_y), dtype=np.int32)
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(axis=1).astype(np.int32))
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(axis=1).astype(np.int32))
    lib.maximum_path_c(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B,
        T_x,
        T_y,
    )
    return paths.astype(np.float32) * np.asarray(mask, dtype=np.float32)
