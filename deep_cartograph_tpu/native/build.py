"""Native extension build + load (g++ via ctypes; no pybind11).

Builds libcarto_native.so from the C++ sources on first use and caches it
next to the sources. Thread-safe enough for test runs (single process)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcarto_native.so")
_SOURCES = ["xdrcodec.cpp", "diptest.cpp", "colvars_io.cpp", "dcdloader.cpp"]
_LIB_CACHE: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for src in _SOURCES:
        path = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(path) and os.path.getmtime(path) > lib_mtime:
            return True
    return False


def build_native() -> bool:
    """Compile the native library. Returns True on success."""
    sources = [
        os.path.join(_NATIVE_DIR, s)
        for s in _SOURCES
        if os.path.exists(os.path.join(_NATIVE_DIR, s))
    ]
    if not sources:
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp", "-pthread",
        *sources, "-o", _LIB_PATH,
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.warning("Native build failed to run: %s", exc)
        return False
    if result.returncode != 0:
        logger.warning("Native build failed:\n%s", result.stderr[-2000:])
        return False
    return True


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB_CACHE, _BUILD_FAILED
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    if _BUILD_FAILED:
        return None
    if _needs_rebuild() and not build_native():
        _BUILD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        logger.warning("Could not load native library: %s", exc)
        _BUILD_FAILED = True
        return None

    lib.xtc_compress_coords.restype = ctypes.c_int
    lib.xtc_compress_coords.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.xtc_decompress_coords.restype = ctypes.c_int
    lib.xtc_decompress_coords.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "xtc_decompress_frames_batch"):
        lib.xtc_decompress_frames_batch.restype = ctypes.c_int
        lib.xtc_decompress_frames_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
    if hasattr(lib, "colvars_parse"):
        lib.colvars_parse.restype = ctypes.c_long
        lib.colvars_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.colvars_format.restype = ctypes.c_long
        lib.colvars_format.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
        ]
        if hasattr(lib, "colvars_format_rt"):
            lib.colvars_format_rt.restype = ctypes.c_long
            lib.colvars_format_rt.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
                ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
            ]
    if hasattr(lib, "dcd_open"):
        lib.dcd_open.restype = ctypes.c_void_p
        lib.dcd_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.dcd_natoms.restype = ctypes.c_int
        lib.dcd_natoms.argtypes = [ctypes.c_void_p]
        lib.dcd_nframes.restype = ctypes.c_int
        lib.dcd_nframes.argtypes = [ctypes.c_void_p]
        lib.dcd_next_chunk.restype = ctypes.c_int
        lib.dcd_next_chunk.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.dcd_close.restype = None
        lib.dcd_close.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "dip_statistics_batch"):
        lib.dip_statistics_batch.restype = None
        lib.dip_statistics_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
    _LIB_CACHE = lib
    return lib
