"""ctypes bindings for the native C++ utilities (csrc/tmdnative.cpp).

The shared library is built on first use with g++ (cached next to the
package); every consumer falls back to the pure-Python implementation when
no compiler is available, so the native layer is an accelerator, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_PKG_DIR), "csrc", "tmdnative.cpp")
_SO = os.path.join(_PKG_DIR, "_tmdnative.so")


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.tmd_parse_floats.restype = ctypes.c_long
        lib.tmd_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ]
        lib.tmd_xtc_decode.restype = ctypes.c_long
        lib.tmd_xtc_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def parse_floats(text: bytes) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    # upper bound: every other char starts a number
    max_out = len(text) // 2 + 2
    out = np.empty(max_out, dtype=np.float64)
    n = lib.tmd_parse_floats(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
    )
    return out[:n].copy()


def xtc_decode(data: bytes):
    """Decode an XTC byte buffer. Returns (coords (natoms,3,nframes) A,
    box (3,nframes) A, steps, times) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    natoms = ctypes.c_long(0)
    nframes = lib.tmd_xtc_decode(data, len(data), ctypes.byref(natoms),
                                 None, None, None, None)
    if nframes < 0:
        raise ValueError(f"corrupt XTC stream (code {nframes})")
    if nframes == 0:
        return (np.zeros((0, 3, 0)), np.zeros((3, 0)),
                np.zeros(0, np.int32), np.zeros(0, np.float32))
    n = natoms.value
    coords = np.empty((nframes, n, 3), dtype=np.float64)
    box = np.empty((nframes, 3), dtype=np.float64)
    steps = np.empty(nframes, dtype=np.int32)
    times = np.empty(nframes, dtype=np.float32)
    ret = lib.tmd_xtc_decode(
        data, len(data), ctypes.byref(natoms),
        coords.ctypes.data_as(ctypes.c_void_p),
        box.ctypes.data_as(ctypes.c_void_p),
        steps.ctypes.data_as(ctypes.c_void_p),
        times.ctypes.data_as(ctypes.c_void_p),
    )
    if ret != nframes:
        raise ValueError("XTC decode inconsistency")
    return (np.transpose(coords, (1, 2, 0)), box.T, steps, times)
