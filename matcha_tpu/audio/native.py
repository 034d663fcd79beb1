"""ctypes binding for the native C++ audio frontend (native/audio/).

Drop-in for :func:`matcha_tpu.audio.mel.mel_spectrogram_np` on the host
data path — same semantics, compiled C++ with OpenMP over frames.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

from matcha_tpu.audio.mel import mel_filterbank

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "audio", "frontend.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "audio", "libaudio.so")

_lock = threading.Lock()
_lib = None


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.mel_spectrogram_c.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ]
            lib.mel_spectrogram_c.restype = ctypes.c_int32
            _lib = lib
    return _lib


def mel_spectrogram_native(
    y: np.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """(n_samples,) float32 -> (num_mels, n_frames) log-mel via C++."""
    assert win_size == n_fft
    lib = _get_lib()
    y = np.ascontiguousarray(y, dtype=np.float32)
    fb = np.ascontiguousarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    pad = (n_fft - hop_size) // 2
    n_frames = 1 + (y.shape[0] + 2 * pad - n_fft) // hop_size
    out = np.empty((num_mels, n_frames), dtype=np.float32)
    written = lib.mel_spectrogram_c(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), y.shape[0],
        fb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_mels, n_fft,
        hop_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if written != n_frames:
        raise RuntimeError(f"native mel frontend failed (returned {written}, expected {n_frames})")
    return out
