"""Constant-band stencil operator parity vs the general DIA operator."""

import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model
from new_cg_variants_tpu.ops.stencil import BandedStencilOperator, window_sum


@pytest.mark.parametrize("n,k", [(1000, 1), (1000, 4), (4096, 32), (777, 16)])
def test_window_sum(n, k):
    rng = np.random.default_rng(k)
    v = rng.standard_normal(n)
    ref = np.array(
        [v[max(0, i - k + 1) : min(n, i + k)].sum() for i in range(n)]
    )
    w = np.asarray(window_sum(jnp.asarray(v), k))
    np.testing.assert_allclose(w, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,k", [(2048, 8), (4099, 32)])
def test_stencil_matches_dia(n, k):
    op_d, b_d, xt = banded_model(n, k=k, kappa=1e4)
    op_s, b_s, _ = banded_model(n, k=k, kappa=1e4, fmt="stencil")
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_d), rtol=1e-12)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(op_s.mv(v)), np.asarray(op_d.mv(v)), rtol=1e-11, atol=1e-11
    )
    y1, y2 = op_s.mv2(v, 2.0 * v)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op_s.diagonal()), np.asarray(op_d.diagonal()), rtol=1e-14
    )
    assert op_s.nnz == op_d.nnz


def test_stencil_solve():
    """End-to-end: pipe-PR-CG over the matrix-free operator."""
    from new_cg_variants_tpu.solvers.api import solve

    op, b, x_true = banded_model(8192, k=8, kappa=1e3, fmt="stencil")
    res = solve(op, b, variant="pipe_pr_cg", rtol=1e-10, max_iter=3000)
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x, np.float64) - x_true)
    assert err < 1e-4
