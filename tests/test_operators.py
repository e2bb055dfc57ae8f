"""Operator formats: DIA/ELL/Dense agree with dense reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.matrix_market import load_matrix
from new_cg_variants_tpu.matio.problems import banded_model, model_spectrum
from new_cg_variants_tpu.ops.operators import (
    DenseOperator,
    DiaOperator,
    EllOperator,
    from_coo,
)


@pytest.mark.parametrize("fmt", ["dense", "dia", "ell"])
def test_from_coo_mv(fmt):
    coo = load_matrix("bcsstk03")
    op = from_coo(coo, fmt=fmt, dtype=jnp.float64)
    a = coo.toarray()
    rng = np.random.default_rng(1)
    v = rng.standard_normal(a.shape[0])
    w = rng.standard_normal(a.shape[0])
    np.testing.assert_allclose(np.asarray(op.mv(v)), a @ v, rtol=1e-12)
    y1, y2 = op.mv2(v, w)
    np.testing.assert_allclose(np.asarray(y1), a @ v, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y2), a @ w, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.diagonal()), np.diagonal(a), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(op.todense()), a, rtol=0)
    assert op.n == a.shape[0]


def test_nnz_counts():
    coo = load_matrix("bcsstk03")
    ell = from_coo(coo, fmt="ell")
    assert ell.nnz == coo.nnz


def test_dia_shift_edges():
    # explicit small case: check boundary handling of positive/negative offsets
    a = np.array(
        [
            [2.0, 1.0, 0.0, 0.0],
            [-1.0, 2.0, 1.0, 0.0],
            [0.0, -1.0, 2.0, 1.0],
            [0.0, 0.0, -1.0, 2.0],
        ]
    )
    data = np.zeros((3, 4))
    data[0, :3] = -1.0  # offset -1: A[i, i-1] valid for i >= 1 -> stored rows 1..3
    # row-indexed convention: data[d, i] = A[i, i+off]
    data_m1 = np.array([0.0, -1.0, -1.0, -1.0])
    data_0 = np.array([2.0, 2.0, 2.0, 2.0])
    data_p1 = np.array([1.0, 1.0, 1.0, 0.0])
    op = DiaOperator(offsets=(-1, 0, 1), data=jnp.asarray(np.stack([data_m1, data_0, data_p1])))
    v = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(op.mv(v)), a @ v, rtol=1e-15)
    np.testing.assert_allclose(np.asarray(op.todense()), a)


def test_model_spectrum():
    op, b, x_true = model_spectrum(256)
    lam = np.asarray(op.data[0])
    # formula from scaling_tests.py:31-36
    kappa, rho = 1e6, 0.9
    i = np.arange(256.0)
    expect = 1 / kappa + (1 - 1 / kappa) * i / 255 * rho ** (255 - i)
    np.testing.assert_allclose(lam, expect, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(op.mv(x_true)), b, rtol=1e-13)


def test_banded_model_matches_dense():
    n, k = 64, 5
    op, b, x_true = banded_model(n, k=k, off_value=1e-3, kappa=100.0, rho=0.9)
    a = np.asarray(op.todense())
    # band condition |i-j| < k, off-diagonal constant (ex2a.c:86-90)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if abs(i - j) < k:
                assert a[i, j] == 1e-3
            else:
                assert a[i, j] == 0.0
    # diagonal formula (ex2a.c:80-81)
    i = np.arange(float(n))
    np.testing.assert_allclose(
        np.diagonal(a), 1 + i / (n - 1) * 99.0 * 0.9 ** (n - 1 - i), rtol=1e-13
    )
    np.testing.assert_allclose(a @ np.ones(n), np.asarray(b), rtol=1e-13)


def test_ell_pallas_kernel_interpret():
    """Experimental in-kernel ELL gather (opt-in on TPU) matches the XLA
    gather formulation in interpret mode."""
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.ops.ell_pallas import ell_spmv
    from new_cg_variants_tpu.ops.operators import from_coo

    coo = cgt.load_matrix("nos3")
    op = from_coo(coo, fmt="ell", dtype=np.float64)
    v = np.random.default_rng(0).standard_normal(op.n)
    got = np.asarray(ell_spmv(op.val, op.idx, jnp.asarray(v), interpret=True))
    want = coo.tocsr() @ v
    np.testing.assert_allclose(got, want, rtol=1e-12,
                               atol=1e-12 * np.abs(want).max())
