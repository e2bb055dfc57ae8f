"""MatrixMarket I/O.

Reads the ``.mtx`` fixtures shipped with the reference repository
(``predict_and_recompute/matrices/*.mtx``; read in the reference via
``scipy.io.mmread`` at ``numerical_experiments/figure_gen.py:350``).

Supports the two layouts those fixtures use:

* ``matrix coordinate real {general,symmetric}``
* ``matrix array real {general,symmetric}``

plus ``integer`` and ``pattern`` fields for robustness.  A native C++
fast path (``native/matio.cpp``) is used automatically for large
coordinate files when the shared library has been built; this pure-Python
implementation is the reference/fallback path and is what the tests pin.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

__all__ = ["read_mtx", "write_mtx", "CooMatrix"]


@dataclass
class CooMatrix:
    """Minimal COO container returned by :func:`read_mtx`.

    Rows/cols are 0-based int64, values float64.  ``shape`` is (m, n).
    Symmetric inputs are expanded (both triangles present).
    """

    shape: tuple
    row: np.ndarray
    col: np.ndarray
    val: np.ndarray

    @property
    def nnz(self) -> int:
        return int(self.val.size)

    def toarray(self) -> np.ndarray:
        a = np.zeros(self.shape, dtype=np.float64)
        np.add.at(a, (self.row, self.col), self.val)
        return a

    def tocsr(self):
        """Convert to scipy CSR (duplicates summed)."""
        import scipy.sparse as sp

        return sp.coo_matrix((self.val, (self.row, self.col)), shape=self.shape).tocsr()


def _parse_header(line: str):
    parts = line.strip().lower().split()
    if len(parts) < 5 or parts[0] != "%%matrixmarket" or parts[1] != "matrix":
        raise ValueError(f"not a MatrixMarket file: {line!r}")
    fmt, field, symmetry = parts[2], parts[3], parts[4]
    if fmt not in ("coordinate", "array"):
        raise ValueError(f"unsupported format {fmt!r}")
    if field not in ("real", "integer", "pattern", "double"):
        raise ValueError(f"unsupported field {field!r}")
    if symmetry not in ("general", "symmetric", "skew-symmetric"):
        raise ValueError(f"unsupported symmetry {symmetry!r}")
    return fmt, field, symmetry


def _try_native_read(path: str):
    """Attempt the C++ fast-path reader; returns None if unavailable."""
    try:
        from . import _native

        return _native.read_coordinate(path)
    except Exception:
        return None


def read_mtx(path: str, native: bool = True) -> CooMatrix:
    """Read a MatrixMarket file into a :class:`CooMatrix`.

    Symmetric matrices are expanded so that both triangles are stored,
    mirroring ``scipy.io.mmread`` semantics (the reference relies on those
    at ``figure_gen.py:350``).
    """
    with open(path, "r") as f:
        header = f.readline()
        fmt, field, symmetry = _parse_header(header)
        # skip comments
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        size_parts = line.split()

        if fmt == "coordinate":
            m, n, nnz = int(size_parts[0]), int(size_parts[1]), int(size_parts[2])
            if native and nnz > 200_000 and field != "pattern":
                res = _try_native_read(path)
                if res is not None:
                    row, col, val = res
                    return _expand_symmetry(
                        CooMatrix((m, n), row, col, val), symmetry
                    )
            if field == "pattern":
                data = np.loadtxt(f, dtype=np.int64, ndmin=2, usecols=(0, 1))
                row = data[:, 0] - 1
                col = data[:, 1] - 1
                val = np.ones(len(row), dtype=np.float64)
            else:
                data = np.loadtxt(f, dtype=np.float64, ndmin=2)
                row = data[:, 0].astype(np.int64) - 1
                col = data[:, 1].astype(np.int64) - 1
                val = (
                    data[:, 2]
                    if data.shape[1] > 2
                    else np.ones(len(row), dtype=np.float64)
                )
            if len(row) != nnz:
                raise ValueError(f"expected {nnz} entries, read {len(row)}")
            return _expand_symmetry(CooMatrix((m, n), row, col, val), symmetry)

        # array (dense, column-major)
        m, n = int(size_parts[0]), int(size_parts[1])
        vals = np.loadtxt(f, dtype=np.float64).ravel()
        if symmetry == "general":
            if vals.size != m * n:
                raise ValueError("bad array entry count")
            a = vals.reshape((n, m)).T  # column-major
            row, col = np.nonzero(np.ones_like(a, dtype=bool))
            return CooMatrix((m, n), row, col, a[row, col])
        # symmetric / skew: lower triangle, column-major
        rows, cols = [], []
        for j in range(n):
            for i in range(j, m):
                rows.append(i)
                cols.append(j)
        row = np.asarray(rows, dtype=np.int64)
        col = np.asarray(cols, dtype=np.int64)
        if vals.size != row.size:
            raise ValueError("bad symmetric array entry count")
        return _expand_symmetry(CooMatrix((m, n), row, col, vals), symmetry)


def _expand_symmetry(coo: CooMatrix, symmetry: str) -> CooMatrix:
    if symmetry == "general":
        return coo
    off = coo.row != coo.col
    sign = -1.0 if symmetry == "skew-symmetric" else 1.0
    row = np.concatenate([coo.row, coo.col[off]])
    col = np.concatenate([coo.col, coo.row[off]])
    val = np.concatenate([coo.val, sign * coo.val[off]])
    return CooMatrix(coo.shape, row, col, val)


def write_mtx(path: str, a, symmetric: bool = False) -> None:
    """Write a dense or COO matrix as ``coordinate real`` MatrixMarket."""
    if isinstance(a, CooMatrix):
        row, col, val, shape = a.row, a.col, a.val, a.shape
    else:
        a = np.asarray(a)
        row, col = np.nonzero(a)
        val = a[row, col]
        shape = a.shape
    if symmetric:
        keep = row >= col
        row, col, val = row[keep], col[keep], val[keep]
    sym = "symmetric" if symmetric else "general"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate real {sym}\n")
        f.write(f"{shape[0]} {shape[1]} {len(val)}\n")
        for i, j, v in zip(row, col, val):
            f.write(f"{i + 1} {j + 1} {v:.16e}\n")


def matrix_path(name: str) -> str:
    """Resolve a fixture matrix by name.

    Looks in ``$CG_TPU_MATRIX_DIR`` and the reference mount's matrix
    directory.
    """
    candidates = [
        os.environ.get("CG_TPU_MATRIX_DIR", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "matrices"),
        "/root/reference/predict_and_recompute/matrices",
    ]
    fname = name if name.endswith(".mtx") else name + ".mtx"
    for d in candidates:
        if d and os.path.exists(os.path.join(d, fname)):
            return os.path.join(d, fname)
    raise FileNotFoundError(f"matrix {name!r} not found in {candidates}")


def load_matrix(name: str) -> CooMatrix:
    """Load a named fixture matrix (e.g. ``'bcsstk03'``)."""
    return read_mtx(matrix_path(name))
