"""ctypes bindings for the native host-staging runtime (native/staging.cpp).

Builds the shared library lazily with g++ (no pybind11 in the image; the
CPython↔C boundary is plain ctypes over contiguous numpy buffers).  Every
entry point degrades gracefully to numpy when the toolchain or library is
unavailable, so the framework never hard-depends on the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "staging.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libstaging.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        lib = ctypes.CDLL(_LIB)
        lib.staging_gather_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.staging_gather_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def gather_u8(src: np.ndarray, indices: np.ndarray,
              out: Optional[np.ndarray] = None,
              n_threads: int = 0) -> np.ndarray:
    """Parallel row gather: out[i] = src[indices[i]].  src is (N, ...) uint8
    contiguous; falls back to numpy fancy indexing without the lib."""
    lib = get_lib()
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None or not src.flags.c_contiguous:
        return src[indices]
    item_bytes = int(np.prod(src.shape[1:]))
    if out is None:
        out = np.empty((len(indices),) + src.shape[1:], np.uint8)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.staging_gather_u8(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        len(indices), item_bytes, n_threads)
    return out


def gather_normalize(src: np.ndarray, indices: np.ndarray,
                     mean, std, n_threads: int = 0) -> np.ndarray:
    """Gather + (x/255 - mean)/std in one native pass (HWC layout)."""
    lib = get_lib()
    indices = np.ascontiguousarray(indices, np.int64)
    mean = np.asarray(mean, np.float32)
    inv_std = (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    if lib is None or not src.flags.c_contiguous:
        x = src[indices].astype(np.float32) / 255.0
        return (x - mean) / np.asarray(std, np.float32)
    item_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(indices),) + src.shape[1:], np.float32)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.staging_gather_normalize(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        len(indices), item_elems,
        mean.ctypes.data_as(ctypes.c_void_p),
        inv_std.ctypes.data_as(ctypes.c_void_p),
        src.shape[-1], n_threads)
    return out


if __name__ == "__main__":
    ok = _build()
    print("built" if ok else "build FAILED", _LIB)
