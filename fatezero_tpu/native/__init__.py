"""ctypes binding for the native image loader (libjpeg/libpng + thread pool).

Builds on demand (g++, ~2 s) the first time it is imported; falls back to
None when no toolchain is available — callers (data/dataset.py) use PIL then.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libimage_loader.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["sh", os.path.join(_DIR, "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.il_load_batch.restype = ctypes.c_int
    lib.il_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def load_batch(
    paths: List[str],
    image_size: int,
    crop_xy: Optional[tuple] = None,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode+short-side-resize+crop `paths` -> [n, S, S, 3] float32 in [-1,1].
    Returns None when the native loader is unavailable or any image fails
    (callers fall back to the Python path)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    cx, cy = crop_xy if crop_xy is not None else (-1, -1)
    threads = num_threads or min(os.cpu_count() or 1, 16)
    ok = lib.il_load_batch(
        arr,
        n,
        image_size,
        cx,
        cy,
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ok != n:
        return None
    return out
