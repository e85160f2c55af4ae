"""Native (C++) accelerators, loaded via ctypes.

The shared library builds on demand with the system toolchain (g++) the first
time it is needed; a built copy is cached next to the sources. Components fall
back to pure-Python implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_NATIVE_DIR, "src")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhive_native.so")

_SOURCES = ["qem_decimate.cpp", "weld.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _needs_rebuild() -> bool:
    if not os.path.isfile(_LIB_PATH):
        return True

    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(os.path.join(_SRC_DIR, src)) > lib_mtime
               for src in _SOURCES)


def _build() -> bool:
    sources = [os.path.join(_SRC_DIR, src) for src in _SOURCES]
    command = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               "-o", _LIB_PATH, *sources]

    logging.info(f"Building native library: {' '.join(command)}")

    try:
        result = subprocess.run(command, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as exc:
        logging.warning(f"Native build failed to run: {exc}")
        return False

    if result.returncode != 0:
        logging.warning(f"Native build failed:\n{result.stderr}")
        return False

    return True


def get_native_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it first if necessary.

    Returns ``None`` when unavailable (callers must fall back to Python).
    """
    global _lib, _build_failed

    with _lock:
        if _lib is not None:
            return _lib

        if _build_failed:
            return None

        if _needs_rebuild() and not _build():
            _build_failed = True
            return None

        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            logging.warning(f"Could not load native library: {exc}")
            _build_failed = True
            return None

        import ctypes as ct

        lib.hive_qem_decimate.restype = ct.c_int
        lib.hive_qem_decimate.argtypes = [
            ct.POINTER(ct.c_double), ct.c_int,
            ct.POINTER(ct.c_int), ct.c_int,
            ct.c_int, ct.c_double,
            ct.POINTER(ct.c_double), ct.POINTER(ct.c_int),
            ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ]

        lib.hive_weld_unique.restype = ct.c_int64
        lib.hive_weld_unique.argtypes = [
            ct.POINTER(ct.c_uint64), ct.c_int64,
            ct.POINTER(ct.c_int64), ct.POINTER(ct.c_int64),
        ]

        lib.hive_oct_average.restype = None
        lib.hive_oct_average.argtypes = [
            ct.POINTER(ct.c_uint32), ct.POINTER(ct.c_int64),
            ct.c_int64, ct.c_int64, ct.POINTER(ct.c_float),
        ]

        _lib = lib
        return _lib


def weld_unique(keys):
    """np.unique(keys, return_index=True, return_inverse=True) — native
    radix-sort weld when the library is available, numpy otherwise.

    :param keys: (N,) uint64 array.
    :return: (first_index (U,) int64, inverse (N,) int64) with unique values
        ascending and first_index holding the smallest original index per
        unique value (np.unique semantics).
    """
    import numpy as np

    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    lib = get_native_lib()

    if lib is None or len(keys) == 0:
        _, first_index, inverse = np.unique(keys, return_index=True,
                                            return_inverse=True)
        return first_index.astype(np.int64), inverse.astype(np.int64)

    first_index = np.empty(len(keys), dtype=np.int64)
    inverse = np.empty(len(keys), dtype=np.int64)

    count = lib.hive_weld_unique(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(keys),
        first_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    if count < 0:  # native allocation failure — numpy fallback
        _, first_index, inverse = np.unique(keys, return_index=True,
                                            return_inverse=True)
        return first_index.astype(np.int64), inverse.astype(np.int64)

    return first_index[:count].copy(), inverse


def oct_average(packed, inverse, num_unique: int):
    """Average oct-encoded normals per welded vertex (one native pass).

    :param packed: (N,) uint32 oct-encoded normals (snorm16 x, y halves).
    :param inverse: (N,) int64 welded ranks from :func:`weld_unique`.
    :param num_unique: number of welded vertices.
    :return: (num_unique, 3) float32 unit normals, or ``None`` when the
        native library is unavailable (callers fall back to numpy).
    """
    import numpy as np

    lib = get_native_lib()
    if lib is None:
        return None

    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    inverse = np.ascontiguousarray(inverse, dtype=np.int64)
    out = np.empty((num_unique, 3), dtype=np.float32)

    lib.hive_oct_average(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(packed), num_unique,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    return out
