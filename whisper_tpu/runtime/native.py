"""ctypes bindings for the native C++ runtime (runtime.cpp).

Auto-builds on first import if g++ is available; every entry point has a
pure-Python fallback, so the framework works without a toolchain (the
reference hard-requires its C++ build; here native is an accelerator)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libwhisper_tpu_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"],
            check=True, capture_output=True, timeout=240)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.wtpu_dequantize.restype = ctypes.c_int
        lib.wtpu_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.wtpu_dtw.restype = ctypes.c_int
        lib.wtpu_dtw.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.wtpu_signal_energy.restype = None
        lib.wtpu_signal_energy.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
        lib.wtpu_version.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def dequantize(ttype: int, raw: bytes, nelems: int,
               n_threads: int = 0) -> Optional[np.ndarray]:
    """Native block dequantization; None if unavailable/unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.empty(nelems, np.float32)
    buf = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) else raw
    rc = lib.wtpu_dequantize(
        ttype, buf.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), nelems, n_threads)
    return out if rc == 0 else None


def dtw(x: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native DTW path; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, m = x.shape
    ti = np.empty(n + m, np.int32)
    tj = np.empty(n + m, np.int32)
    ln = lib.wtpu_dtw(x.ctypes.data_as(ctypes.c_void_p), n, m,
                      ti.ctypes.data_as(ctypes.c_void_p),
                      tj.ctypes.data_as(ctypes.c_void_p))
    if ln < 0:
        return None
    return ti[:ln].copy(), tj[:ln].copy()


def signal_energy(x: np.ndarray, hw: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.float32)
    lib.wtpu_signal_energy(x.ctypes.data_as(ctypes.c_void_p), len(x), hw,
                           out.ctypes.data_as(ctypes.c_void_p))
    return out
