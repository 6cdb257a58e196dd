"""ctypes bindings for the native columnar CSV loader (native/fastcsv.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); every caller falls back to the pandas path when the toolchain or
binary is unavailable, so the native loader is a pure accelerator, never
a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastcsv.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libfastcsv.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.fastcsv_count_rows.restype = ctypes.c_int64
        lib.fastcsv_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                           ctypes.c_int]
        lib.fastcsv_parse.restype = ctypes.c_int64
        lib.fastcsv_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_char, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_columns(path: str, sep: str, n_cols: int,
                 skip_header: bool = True) -> list[np.ndarray] | None:
    """Parse the first ``n_cols`` columns of a delimited file into float64
    arrays.  Returns None when the native loader is unavailable or the
    separator is not a single byte (callers then fall back to pandas)."""
    lib = _load()
    if lib is None or len(sep) != 1:
        return None
    # The native parser is numeric-only: peek at the first data line and
    # bail to pandas when any needed field isn't a plain number.
    try:
        with open(path, "r") as f:
            if skip_header:
                f.readline()  # header (skipped by the parser too)
            probe = f.readline().rstrip("\r\n").split(sep)
        if len(probe) < n_cols:
            return None
        for tok in probe[:n_cols]:
            float(tok)
    except (OSError, ValueError):
        return None
    bsep = sep.encode()
    rows = lib.fastcsv_count_rows(path.encode(), bsep, int(skip_header))
    if rows < 0:
        return None
    cols = [np.empty(rows, dtype=np.float64) for _ in range(n_cols)]
    ptrs = (ctypes.POINTER(ctypes.c_double) * n_cols)(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for c in cols])
    got = lib.fastcsv_parse(path.encode(), bsep, int(skip_header), n_cols,
                            ptrs, rows)
    if got < 0:
        return None
    return [c[:got] for c in cols]
