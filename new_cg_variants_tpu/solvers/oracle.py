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
"""

from __future__ import annotations

import numpy as np

__all__ = ["exact_cg", "exact_pcg"]


def _as_dense(A):
    """Accept operators, CooMatrix, scipy sparse, or arrays."""
    if hasattr(A, "todense"):
        return np.asarray(A.todense())
    if hasattr(A, "toarray"):
        return np.asarray(A.toarray())
    return np.asarray(A)


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
    A = _as_dense(A).astype(dtype)
    b = np.asarray(b, dtype=dtype)
    n = b.shape[0]
    x = np.zeros_like(b) if x0 is None else np.asarray(x0, dtype=dtype)
    if preconditioner is None:
        prec = lambda v: v
    elif isinstance(preconditioner, str) and preconditioner == "jacobi":
        d = 1.0 / np.diagonal(A)
        prec = lambda v: d * v
    elif hasattr(preconditioner, "apply"):
        prec = lambda v: np.asarray(preconditioner.apply(v), dtype=dtype)
    else:
        prec = preconditioner

    probes = probes or ("updated_residual_2_norm",)
    want = set(probes)
    if x_true is None and any(p.startswith("error") for p in want):
        x_true = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    if x_true is not None:
        x_true = np.asarray(x_true, dtype=dtype)

    hist = {p: np.zeros(max_iter, dtype=np.float64) for p in want}

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
            elif name == "nu":
                hist[name][k] = float(nu)

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
