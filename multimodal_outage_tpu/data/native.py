"""ctypes binding for the native batch-gather library (native/gather.cpp).

Builds libgather.so on first use (g++ via native/Makefile) and falls back
to numpy fancy indexing if the toolchain or build is unavailable. The
native path threads the per-frame memcpys of the host gather — the
framework's equivalent of the reference's DataLoader worker processes
(reference lit.py:164), without pickling or IPC.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libgather.so")
_MAKE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _MAKE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_f32.restype = ctypes.c_int
            lib.gather_f32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return load_library() is not None


def _default_threads() -> int:
    return max(2, min(8, os.cpu_count() or 2))


def gather_frames(frames: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """frames [D, ...], indices [K] → contiguous [K, ...] float32.

    Uses the native threaded gather when frames is a contiguous float32
    array (incl. memmaps); falls back to numpy fancy indexing.
    """
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib = load_library()
    usable = (
        lib is not None
        and frames.dtype == np.float32
        and frames.flags["C_CONTIGUOUS"]
    )
    if not usable:
        return np.asarray(frames[indices], dtype=np.float32)

    frame_elems = int(np.prod(frames.shape[1:]))
    out = np.empty((indices.shape[0],) + frames.shape[1:], dtype=np.float32)
    rc = lib.gather_f32(
        frames.ctypes.data,
        indices.ctypes.data,
        out.ctypes.data,
        ctypes.c_int64(indices.shape[0]),
        ctypes.c_int64(frame_elems),
        _default_threads(),
    )
    if rc != 0:  # pragma: no cover - defensive
        return np.asarray(frames[indices], dtype=np.float32)
    return out
