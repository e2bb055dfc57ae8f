"""Exact-arithmetic oracle: HS-CG with full reorthogonalization.

The ground truth every finite-precision variant is compared against.
Mirrors the role of ``numerical_experiments/cg_variants/exact_cg.py``: HS
iteration in extended precision (``np.longdouble``) with each new residual
explicitly orthogonalized against all previous residuals, and early exit
at ``sqrt(nu) < sqrt(nu_0) * 1e-14`` (``exact_cg.py:108,149-150``).

This deliberately runs in NumPy on host, off-TPU: TPUs have no f80/f64
long-double path, and the reference itself runs its oracle in longdouble
on CPU (``figure_gen.py:53-55``).  The O(k n) reorthogonalization sweep is
a GEMV against the stored residual basis, so it is still vectorized.

Large operators stay SPARSE end-to-end: the matvec runs on a longdouble
scipy CSR and ``x_true`` comes from a sparse LU — the reference's own
structure (``exact_cg.py`` iterates on the CSR it is given;
``callbacks/error_A_norm.py:36-39`` spsolve) — so the big third of the
experiment matrix (bcsstk17/18, s*rm*, n up to ~90k) runs without the
O(n^2) densification.
"""

from __future__ import annotations

import numpy as np

__all__ = ["exact_cg", "exact_pcg"]


#: above this dimension the oracle keeps A sparse (CSR longdouble)
_SPARSE_MIN_N = 4096

#: probe names the oracle records; anything else raises (no silent
#: zero-filled histories)
KNOWN_PROBES = (
    "updated_residual_2_norm", "residual_2_norm", "error_A_norm",
    "error_2_norm", "alpha", "beta", "nu", "save_x", "save_r",
)


def _as_matrix(A, dtype):
    """Operator/CooMatrix/scipy/array -> dense ndarray or scipy CSR.

    Sparse-representable operators above ``_SPARSE_MIN_N`` rows come back
    as CSR in the requested (long double) dtype; ``A @ x`` and
    ``A.diagonal()`` work identically on both returns.
    """
    import scipy.sparse as sp

    if sp.issparse(A):
        csr = A.tocsr()
        if csr.shape[0] >= _SPARSE_MIN_N:
            return csr.astype(dtype)
        return np.asarray(csr.toarray(), dtype=dtype)
    if hasattr(A, "tocsr"):
        n = A.n if hasattr(A, "n") else A.shape[0]
        if n >= _SPARSE_MIN_N:
            return A.tocsr().astype(dtype)
    if hasattr(A, "todense"):
        return np.asarray(A.todense(), dtype=dtype)
    if hasattr(A, "toarray"):
        return np.asarray(A.toarray(), dtype=dtype)
    return np.asarray(A, dtype=dtype)


def _solve_x_true(A, b):
    """f64 direct solve, sparse when A is sparse."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    if sp.issparse(A):
        return spla.spsolve(A.astype(np.float64).tocsc(),
                            np.asarray(b, dtype=np.float64))
    return np.linalg.solve(A.astype(np.float64),
                           np.asarray(b, dtype=np.float64))


def exact_cg(A, b, x0=None, max_iter=100, probes=None, dtype=np.longdouble, **kwargs):
    return exact_pcg(
        A, b, x0=x0, max_iter=max_iter, probes=probes, preconditioner=None,
        dtype=dtype, _name="exact_cg", **kwargs
    )


def exact_pcg(
    A,
    b,
    x0=None,
    max_iter=100,
    probes=None,
    preconditioner=None,
    x_true=None,
    dtype=np.longdouble,
    tol_factor=1e-14,
    _name="exact_pcg",
    **kwargs,
):
    """HS-PCG with M^{-1}-orthogonalized residuals in extended precision.

    Returns an output dict shaped like :func:`..solvers.api.run` results:
    probe histories are truncated at the early-exit iteration.
    """
    A = _as_matrix(A, dtype)
    b = np.asarray(b, dtype=dtype)
    n = b.shape[0]
    x = np.zeros_like(b) if x0 is None else np.asarray(x0, dtype=dtype)
    if preconditioner is None:
        prec = lambda v: v
    elif isinstance(preconditioner, str) and preconditioner == "jacobi":
        d = 1.0 / np.asarray(A.diagonal())
        prec = lambda v: d * v
    elif hasattr(preconditioner, "apply"):
        prec = lambda v: np.asarray(preconditioner.apply(v), dtype=dtype)
    else:
        prec = preconditioner

    probes = probes or ("updated_residual_2_norm",)
    unknown = set(probes) - set(KNOWN_PROBES)
    if unknown:
        raise ValueError(
            f"unknown oracle probes {sorted(unknown)}; known: {KNOWN_PROBES}"
        )
    want = set(probes)
    if x_true is None and any(p.startswith("error") for p in want):
        x_true = _solve_x_true(A, b)
    if x_true is not None:
        x_true = np.asarray(x_true, dtype=dtype)

    hist = {
        p: (np.zeros((max_iter, n), dtype=np.float64)
            if p in ("save_x", "save_r")
            else np.zeros(max_iter, dtype=np.float64))
        for p in want
    }

    kmax = min(n, max_iter)
    R = np.zeros((kmax, n), dtype=dtype)
    Rt = np.zeros((kmax, n), dtype=dtype)

    r = b - A @ x
    rt = prec(r)
    nu = r @ rt
    R[0] = r / np.sqrt(nu)
    Rt[0] = rt / np.sqrt(nu)
    p = rt.copy()
    s = A @ p
    mu = p @ s
    a = nu / mu
    tol = np.sqrt(nu) * tol_factor

    def record(k):
        for name in want:
            if name == "updated_residual_2_norm":
                hist[name][k] = float(np.sqrt(r @ r))
            elif name == "residual_2_norm":
                tr = b - A @ x
                hist[name][k] = float(np.sqrt(tr @ tr))
            elif name == "error_A_norm":
                e = x - x_true
                hist[name][k] = float(np.sqrt(e @ (A @ e)))
            elif name == "error_2_norm":
                e = x - x_true
                hist[name][k] = float(np.sqrt((x - x_true) @ (x - x_true)))
            elif name == "alpha":
                hist[name][k] = float(a)
            elif name == "beta":
                hist[name][k] = float(beta) if k else 0.0
            elif name == "nu":
                hist[name][k] = float(nu)
            elif name == "save_x":
                hist[name][k] = np.asarray(x, dtype=np.float64)
            elif name == "save_r":
                hist[name][k] = np.asarray(r, dtype=np.float64)

    beta = 0.0
    record(0)
    last = 0
    for k in range(1, max_iter):
        x = x + a * p
        r = r - a * s
        if k < kmax:
            # enforce M^{-1}-orthogonality against all previous residuals
            r = r - R[:k].T @ (Rt[:k] @ r)
        rt = prec(r)
        nu1 = nu
        nu = r @ rt
        if k < kmax:
            R[k] = r / np.sqrt(nu)
            Rt[k] = rt / np.sqrt(nu)
        beta = nu / nu1
        p = rt + beta * p
        s = A @ p
        mu = p @ s
        a = nu / mu
        record(k)
        last = k
        if np.sqrt(nu) < tol:
            break

    out = {"name": _name, "max_iter": max_iter, "x": x.astype(np.float64),
           "iterations": last}
    for name in want:
        out[name] = hist[name][: last + 1]
    return out
