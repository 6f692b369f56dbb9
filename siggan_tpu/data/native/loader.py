"""ctypes binding for the native C++ decoder (with PIL fallback).

Build is lazy and cached: the first import compiles ``decoder.cpp`` with g++
against system libpng/libjpeg into ``libsigdecode.so`` next to this file.
Every entry point degrades gracefully to the PIL path in
``siggan_tpu.data.dataset`` when the toolchain or libraries are missing, so
the framework never hard-depends on the native component.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "decoder.cpp"
_LIB = _HERE / "libsigdecode.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", str(_SRC),
           "-lpng", "-ljpeg", "-lpthread", "-o", str(_LIB)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native decoder build failed to run: %s", e)
        return False
    if r.returncode != 0:
        logger.warning("native decoder build failed:\n%s", r.stderr[-2000:])
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # A packaged install may ship only the built .so (no source): use it
    # as-is. Rebuild only when the source exists and is newer.
    if not _LIB.exists() or (_SRC.exists()
                             and _LIB.stat().st_mtime < _SRC.stat().st_mtime):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as e:
        logger.warning("could not load native decoder: %s", e)
        _build_failed = True
        return None
    lib.sig_decode.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.sig_decode.restype = ctypes.c_int
    lib.sig_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.sig_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_one(path: str | Path, target_size: int) -> Optional[np.ndarray]:
    """Decode+resize one image -> (s, s) uint8, or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((target_size, target_size), np.uint8)
    st = lib.sig_decode(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        target_size)
    return out if st == 0 else None


def decode_batch(paths: List[str | Path], target_size: int,
                 n_threads: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode -> ((n, s, s) uint8, (n,) int32 statuses).

    status 0 = ok; failed entries are zero-filled (callers apply the same
    zero-image fallback contract as the PIL path).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.zeros((n, target_size, target_size), np.uint8)
    statuses = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.sig_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        target_size, threads,
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, statuses
