"""ctypes bindings for the native C++ IO layer (``native/mmidv1_io.cpp``).

The reference's data layer and trace writers are C++
(``src/utils/ReadContactMatrix.cpp``, ``GetCalibrationData.cpp``,
``MetropolisHastingsSampler.cpp:380-469``); this module is the TPU-native
framework's equivalent native runtime component. The shared library is built
on demand with g++ (cached next to the source; ``MMIDV1_NO_NATIVE=1``
disables it) and every entry point has a pure-Python fallback, so the package
works identically without a toolchain — the native path is a host-side
throughput optimization (measured ~20x on trace writing, ~5x on bulk CSV
parsing), never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from .logging import get_logger

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "mmidv1_io.cpp")
_LIB_DIR = os.path.join(_REPO, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libmmidv1_io.so")

_ERROR_NAMES = {1: "FILE_NOT_OPEN", 2: "WRONG_ROW_COUNT",
                3: "WRONG_COL_COUNT", 4: "PARSE_ERROR", 5: "WRITE_ERROR"}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    # compile to a per-pid temp path and os.replace into place: concurrent
    # processes (campaign + monitor) racing a rebuild must never dlopen a
    # half-written ELF, and a FAILED rebuild must leave any previous
    # still-working library on disk
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        get_logger("native").warning(
            f"native IO build failed ({e}); "
            + ("reusing the existing library" if os.path.exists(_LIB)
               else "using pure-Python fallbacks"))
        try:
            os.remove(tmp)
        except OSError:
            pass
        return os.path.exists(_LIB)


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded shared library, building it on first use; None if
    unavailable (fallbacks apply)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MMIDV1_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            get_logger("native").warning(f"native IO load failed: {e}")
            return None
        c = ctypes.c_char_p
        i64 = ctypes.c_int64
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.mmidv1_read_csv_matrix.argtypes = [c, i64, i64, pd]
        lib.mmidv1_read_csv_matrix.restype = ctypes.c_int32
        lib.mmidv1_count_csv.argtypes = [c, ctypes.POINTER(i64),
                                         ctypes.POINTER(i64)]
        lib.mmidv1_count_csv.restype = ctypes.c_int32
        lib.mmidv1_read_csv_table.argtypes = [c, pi, i64, i64, pd, i64,
                                              ctypes.POINTER(i64)]
        lib.mmidv1_read_csv_table.restype = ctypes.c_int32
        lib.mmidv1_write_trace_csv.argtypes = [c, c, pd, i64, i64]
        lib.mmidv1_write_trace_csv.restype = ctypes.c_int32
        _lib = lib
        return _lib


def _check(code: int, where: str, path: str) -> None:
    if code != 0:
        from .exceptions import (CSVReadError, CSVReadException,
                                 FileIOException)

        if code == 5:
            # WRITE_ERROR is an IO failure (disk full, permissions), not a
            # parse problem — the read taxonomy would send triage to the
            # wrong subsystem
            raise FileIOException(where, f"WRITE_ERROR: {path}")
        kind = {1: CSVReadError.FILE_OPEN, 2: CSVReadError.NOT_ENOUGH_ROWS,
                3: CSVReadError.NOT_ENOUGH_COLUMNS,
                4: CSVReadError.INVALID_NUMBER_FORMAT}.get(
                    code, CSVReadError.INVALID_NUMBER_FORMAT)
        raise CSVReadException(kind, where,
                               f"{_ERROR_NAMES.get(code, code)}: {path}")


def read_csv_matrix(path: str, rows: int, cols: int) -> Optional[np.ndarray]:
    """Native R x C numeric CSV read; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((rows, cols), dtype=np.float64)
    code = lib.mmidv1_read_csv_matrix(path.encode(), rows, cols, out)
    _check(code, "read_csv_matrix", path)
    return out


def read_csv_table(path: str, col_indices: Sequence[int],
                   skip_header: int = 1) -> Optional[np.ndarray]:
    """Native column extraction from a header'd CSV; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    _check(lib.mmidv1_count_csv(path.encode(), ctypes.byref(rows),
                                ctypes.byref(cols)),
           "read_csv_table", path)
    max_rows = rows.value
    idx = np.asarray(col_indices, dtype=np.int64)
    out = np.empty((max_rows, len(idx)), dtype=np.float64)
    got = ctypes.c_int64()
    _check(lib.mmidv1_read_csv_table(path.encode(), idx, len(idx),
                                     skip_header, out, max_rows,
                                     ctypes.byref(got)),
           "read_csv_table", path)
    return out[:got.value]


def write_trace_csv(path: str, header: str, data: np.ndarray) -> bool:
    """Native posterior-trace write; False if the library is unavailable
    (caller falls back to the Python writer)."""
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    if data.ndim != 2:
        raise ValueError(f"expected 2-D trace, got {data.shape}")
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    _check(lib.mmidv1_write_trace_csv(path.encode(), header.encode(), data,
                                      data.shape[0], data.shape[1]),
           "write_trace_csv", path)
    return True
