"""ctypes bindings for the native runtime library (libsdtpu_native.so).

Builds on demand with the in-tree Makefile (g++ -O3 -fopenmp) the first time
it is needed; every caller degrades gracefully to the pure-Python/numpy
implementations when the toolchain or the build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdtpu_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=_NATIVE_DIR,
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.sdtpu_linkage_centroid.restype = ctypes.c_int
        lib.sdtpu_linkage_centroid.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sdtpu_read_wav_info.restype = ctypes.c_int
        lib.sdtpu_read_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.sdtpu_read_wav_data.restype = ctypes.c_int
        lib.sdtpu_read_wav_data.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def linkage_centroid(X: np.ndarray) -> Optional[np.ndarray]:
    """Native centroid linkage; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, dtype=np.float64)
    n, d = X.shape
    if n < 2:
        return np.zeros((0, 4))
    Z = np.zeros((n - 1, 4), dtype=np.float64)
    rc = lib.sdtpu_linkage_centroid(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        d,
        Z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return Z


def read_wav(path: str):
    """Native WAV read -> (samples (channels, n) float32 raw amplitude,
    sample_rate, bits); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bits = ctypes.c_int()
    frames = ctypes.c_longlong()
    rc = lib.sdtpu_read_wav_info(
        path.encode(), ctypes.byref(channels), ctypes.byref(rate),
        ctypes.byref(bits), ctypes.byref(frames),
    )
    if rc != 0:
        return None
    total = frames.value * channels.value
    out = np.empty(total, dtype=np.float32)
    rc = lib.sdtpu_read_wav_data(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), total
    )
    if rc != 0:
        return None
    samples = out.reshape(-1, channels.value).T.copy()
    return samples, rate.value, bits.value
