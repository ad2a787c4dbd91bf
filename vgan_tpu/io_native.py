"""ctypes binding for the native tabular ingest engine (native/libvgan_io.so).

Builds the shared library on first use if the C++ toolchain is available
(``make -C native``); every entry point falls back to numpy when the native
path is unavailable, so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvgan_io.so"
_lib = None
_lib_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vgan_csv_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vgan_csv_dims.restype = ctypes.c_int
        for name, ptr_t in (
            ("vgan_csv_read_f32", ctypes.POINTER(ctypes.c_float)),
            ("vgan_csv_read_f64", ctypes.POINTER(ctypes.c_double)),
        ):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p,
                ptr_t,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.c_int,
            ]
            fn.restype = ctypes.c_int
        for name, ptr_t in (
            ("vgan_csv_read_range_f32", ctypes.POINTER(ctypes.c_float)),
            ("vgan_csv_read_range_f64", ctypes.POINTER(ctypes.c_double)),
        ):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p,
                ptr_t,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.c_int,
            ]
            fn.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def load_csv(
    path,
    dtype=np.float64,
    nthreads: Optional[int] = None,
    skip_rows: int = 0,
    max_rows: Optional[int] = None,
) -> np.ndarray:
    """Parse a numeric CSV into an (n, d) array.

    Native path: mmap + row-aligned multithreaded strtod. Falls back to
    ``numpy.loadtxt`` when the shared library can't be built/loaded.

    ``skip_rows``/``max_rows`` select a contiguous row range (data rows,
    after any header) — the multi-host ingest path: each process loads only
    its ``parallel.input.process_row_range`` slice and assembles the global
    array with ``jax.make_array_from_process_local_data``.
    """
    path = str(path)
    lib = _load_library()
    dtype = np.dtype(dtype)
    if lib is None:
        return _numpy_fallback(path, dtype, skip_rows, max_rows)

    rows = ctypes.c_long()
    cols = ctypes.c_long()
    header = ctypes.c_int()
    rc = lib.vgan_csv_dims(path.encode(), ctypes.byref(rows),
                           ctypes.byref(cols), ctypes.byref(header))
    if rc != 0:
        raise OSError(f"native CSV dims failed for {path} (rc={rc})")
    n_avail = max(rows.value - skip_rows, 0)
    n_read = n_avail if max_rows is None else min(max_rows, n_avail)
    out = np.empty((n_read, cols.value), dtype=dtype)
    if n_read == 0:
        return out
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, 16)
    if dtype == np.float32:
        c_t = ctypes.c_float
        fn = lib.vgan_csv_read_range_f32 if skip_rows or max_rows is not None \
            else lib.vgan_csv_read_f32
    elif dtype == np.float64:
        c_t = ctypes.c_double
        fn = lib.vgan_csv_read_range_f64 if skip_rows or max_rows is not None \
            else lib.vgan_csv_read_f64
    else:
        return _numpy_fallback(path, dtype, skip_rows, max_rows)
    ptr = out.ctypes.data_as(ctypes.POINTER(c_t))
    if skip_rows or max_rows is not None:
        rc = fn(path.encode(), ptr, skip_rows, n_read, cols.value,
                header.value, nthreads)
    else:
        rc = fn(path.encode(), ptr, n_read, cols.value, header.value, nthreads)
    if rc != 0:
        # a file the native fast path can't parse (ragged rows, exotic
        # formats) may still be loadable by numpy — degrade, don't fail
        return _numpy_fallback(path, dtype, skip_rows, max_rows)
    return out


def _numpy_fallback(path: str, dtype, skip_rows: int = 0,
                    max_rows: Optional[int] = None) -> np.ndarray:
    # find the first content line (leading blank lines are not the header —
    # the native parser skips them; mirror that here), then sniff whether
    # it is a header row
    with open(path) as fh:
        first_idx = 0
        first = ""
        for line in fh:
            if line.strip():
                first = line
                break
            first_idx += 1
    try:
        [float(v) for v in first.strip().split(",")]
        skip = first_idx  # numeric: physically skip only the blank lines
    except ValueError:
        skip = first_idx + 1  # header: skip blanks + the header line
    # loadtxt's skiprows counts PHYSICAL lines (including blanks), but the
    # native path's skip_rows counts content rows: load fully, then slice.
    # ndmin=2 keeps single-column files as (n, 1), not a (1, n) row vector.
    arr = np.loadtxt(path, delimiter=",", skiprows=skip, dtype=dtype, ndmin=2)
    end = None if max_rows is None else skip_rows + max_rows
    return arr[skip_rows:end]
