"""ctypes binding for the C++ batch image loader (native/loader.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source) and exposes `decode_batch`. The native path handles the
standard case — source PNGs already at the target size — bit-exactly
(decode + scipy-bytescale stretch + [-1,1] normalize); anything it
can't handle (resize needed, non-PNG, decode error) is reported per
image so the caller falls back to the PIL path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'loader.cpp')
_SO = os.path.join(_REPO_ROOT, 'native', 'libedgegan_loader.so')

_lib = None
_lib_lock = threading.Lock()
_unavailable = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-o', _SO, _SRC,
             '-lpng', '-lpthread'],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    with _lib_lock:
        if _lib is not None or _unavailable:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                _unavailable = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.edgegan_decode_batch.restype = ctypes.c_int
            lib.edgegan_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            _lib = lib
        except OSError:
            _unavailable = True
    return _lib


def decode_batch(paths: List[str], height: int, width: int,
                 n_threads: int = 8):
    """Returns (images [n,h,w,3] float32 in [-1,1], fail_mask [n] bool).

    fail_mask[i] True means image i was NOT decoded (caller falls back).
    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    fail = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.edgegan_decode_batch(
        arr, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads)
    return out, fail.astype(bool)
