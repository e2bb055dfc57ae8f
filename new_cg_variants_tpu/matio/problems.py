"""Synthetic model problems used by the scaling experiments.

TPU-native re-expressions of the reference generators:

* :func:`model_spectrum` — the diagonal model problem of the mpi4py strong
  scaling runs (``scaling_experiments_mpi4py/scaling_tests.py:30-37``):
  eigenvalues ``lam_i = lam1 + (lamn-lam1) * i/(n-1) * rho**(n-1-i)`` with
  ``lam1 = 1/kappa``, ``lamn = 1``.
* :func:`banded_model` — the k-banded model problem of the PETSc strong
  scaling runs (``scaling_experiments_petsc/ex2a.c:77-95``): diagonal
  ``1 + (i/(n-1)) * (kappa-1) * rho**(n-1-i)``, constant ``off_value`` on
  all off-diagonals with ``|i-j| < k``.

Both return operators from :mod:`new_cg_variants_tpu.ops` plus right-hand
sides with known exact solutions, so that forward error is checkable after
a timed solve (the reference's correctness-by-known-solution strategy,
``scaling_tests.py:74-81``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "model_spectrum_eigenvalues",
    "model_spectrum",
    "banded_model_diagonal",
    "banded_model",
]


def model_spectrum_eigenvalues(
    n: int, kappa: float = 1e6, rho: float = 0.9, dtype=np.float64
) -> np.ndarray:
    """Eigenvalues of the mpi4py diagonal model problem."""
    lam1 = 1.0 / kappa
    lamn = 1.0
    i = np.arange(n, dtype=dtype)
    decay = rho ** np.arange(n - 1, -1, -1, dtype=dtype)
    return (lam1 + (lamn - lam1) * i / (n - 1) * decay).astype(dtype)


def model_spectrum(n: int, kappa: float = 1e6, rho: float = 0.9, dtype=np.float64):
    """Diagonal model problem ``A = diag(Lambda)``.

    Returns ``(op, b, x_true)`` where ``x_true = 1/sqrt(n)`` (constant unit
    vector) and ``b = A @ x_true`` — the same normalisation as
    ``scaling_tests.py:29,57`` so the forward error check carries over.
    """
    from ..ops.operators import DiaOperator

    lam = model_spectrum_eigenvalues(n, kappa, rho, dtype)
    op = DiaOperator(offsets=(0,), data=lam[None, :].astype(dtype))
    x_true = np.full(n, 1.0 / np.sqrt(n), dtype=dtype)
    b = lam * x_true
    return op, b, x_true


def banded_model_diagonal(
    n: int, kappa: float = 1e6, rho: float = 0.95, dtype=np.float64
) -> np.ndarray:
    """Diagonal entries of the PETSc k-banded model problem."""
    i = np.arange(n, dtype=dtype)
    return (1.0 + i / (n - 1) * (kappa - 1.0) * rho ** np.arange(n - 1, -1, -1, dtype=dtype)).astype(dtype)


def banded_model(
    n: int,
    k: int = 32,
    off_value: float = 1e-4,
    kappa: float = 1e6,
    rho: float = 0.95,
    dtype=np.float64,
    fmt: str = "dia",
):
    """k-banded model problem.

    Off-diagonals at distances ``1 .. k-1`` on each side hold the constant
    ``off_value`` (band condition ``|i-j| < k``, matching ``ex2a.c:86-90``);
    nnz/row is ``2k - 1`` in the interior.

    ``fmt='dia'`` returns the general DIA operator; ``fmt='symdia'``
    the symmetric half-band storage (:class:`~..ops.sym_dia.
    SymDiaOperator` — half the matrix traffic, SPD-only);
    ``fmt='stencil'`` the matrix-free :class:`~..ops.stencil.
    BandedStencilOperator` (O(n) matvec, no matrix storage — the
    constant-band fast path).

    Returns ``(op, b, x_true)`` with ``x_true = 1`` (the PETSc drivers'
    exact solution ``u = 1``) and ``b = A @ x_true``.
    """
    from ..ops.operators import DiaOperator

    diag = banded_model_diagonal(n, kappa, rho, dtype)
    if fmt == "stencil":
        import jax.numpy as jnp

        from ..ops.stencil import BandedStencilOperator

        op = BandedStencilOperator(
            jnp.asarray(diag), jnp.asarray(off_value, dtype=diag.dtype), k
        )
        x_true = np.ones(n, dtype=dtype)
        counts = np.minimum(np.arange(n), k - 1) + np.minimum(
            n - 1 - np.arange(n), k - 1
        )
        b = diag + off_value * counts
        return op, b, x_true
    if fmt == "symdia":
        from ..ops.sym_dia import SymDiaOperator

        offsets = tuple(range(k))
        data = np.full((k, n), off_value, dtype=dtype)
        data[0] = diag
        for d in range(1, k):
            data[d, n - d :] = 0.0
        op = SymDiaOperator(offsets, data)
        x_true = np.ones(n, dtype=dtype)
        counts = np.minimum(np.arange(n), k - 1) + np.minimum(
            n - 1 - np.arange(n), k - 1
        )
        b = diag + off_value * counts
        return op, b, x_true
    offsets = tuple(range(-(k - 1), k))
    ndiag = len(offsets)
    data = np.full((ndiag, n), off_value, dtype=dtype)
    for d, off in enumerate(offsets):
        if off == 0:
            data[d] = diag
        elif off > 0:
            # entries A[i, i+off] exist for i < n-off; pad tail with zeros
            data[d, n - off :] = 0.0
        else:
            data[d, : -off] = 0.0
    op = DiaOperator(offsets=offsets, data=data)
    x_true = np.ones(n, dtype=dtype)
    # b = A @ 1: row sums.  Out-of-band positions are stored as explicit
    # zeros (row-indexed DIA convention), so the row sum is a plain sum
    # over diagonals.
    b = data.sum(axis=0)
    return op, b, x_true
