"""ctypes bindings for the native data-loading library.

Loads ``native/build/libncgv_native.so`` (building it with the
``native/Makefile`` on first use when a toolchain is present) and exposes:

* :func:`read_coordinate` — fast MatrixMarket coordinate parser; the
  Python fallback in :mod:`.matrix_market` stays authoritative for
  correctness (tests pin both against each other).
* :func:`pack_ell` — COO→padded-ELL packing without the per-entry
  Python loop of :func:`~..ops.operators.from_coo`.

Every entry point raises on unavailability; callers treat any exception
as "use the Python path".
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

__all__ = ["read_coordinate", "pack_ell", "available"]

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libncgv_native.so"

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise RuntimeError("native build previously failed")
    if not _SO_PATH.exists():
        if not (_NATIVE_DIR / "Makefile").exists():
            _build_failed = True
            raise RuntimeError("native sources not present")
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # toolchain absent, build error, timeout
            _build_failed = True
            raise RuntimeError(f"native build failed: {e}") from e
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.ncgv_read_coordinate.restype = ctypes.c_int64
    lib.ncgv_read_coordinate.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
    ]
    lib.ncgv_free.restype = None
    lib.ncgv_free.argtypes = [ctypes.c_void_p]
    lib.ncgv_pack_ell.restype = ctypes.c_int32
    lib.ncgv_pack_ell.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def read_coordinate(path):
    """Parse coordinate entries; returns (row, col, val) 0-based arrays."""
    lib = _load()
    row_p = ctypes.POINTER(ctypes.c_int64)()
    col_p = ctypes.POINTER(ctypes.c_int64)()
    val_p = ctypes.POINTER(ctypes.c_double)()
    nnz = lib.ncgv_read_coordinate(
        os.fspath(path).encode(), ctypes.byref(row_p), ctypes.byref(col_p),
        ctypes.byref(val_p),
    )
    if nnz < 0:
        raise ValueError(f"native parse failed for {path}")
    try:
        row = np.ctypeslib.as_array(row_p, shape=(nnz,)).copy()
        col = np.ctypeslib.as_array(col_p, shape=(nnz,)).copy()
        val = np.ctypeslib.as_array(val_p, shape=(nnz,)).copy()
    finally:
        lib.ncgv_free(row_p)
        lib.ncgv_free(col_p)
        lib.ncgv_free(val_p)
    return row, col, val


def pack_ell(row, col, val, n: int, L: int):
    """COO (sorted by row,col) -> (ell_val (n,L) f64, ell_idx (n,L) i32)."""
    lib = _load()
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    val = np.ascontiguousarray(val, dtype=np.float64)
    ell_val = np.zeros((n, L), dtype=np.float64)
    ell_idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, L))
    rc = lib.ncgv_pack_ell(
        row.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(val), n, L,
        ell_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ell_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("native ELL pack failed (row overflow?)")
    return ell_val, ell_idx
