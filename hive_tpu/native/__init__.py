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

_SOURCES = ["qem_decimate.cpp"]

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

        _lib = lib
        return _lib
