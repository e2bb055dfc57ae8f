"""Symmetric half-band DIA storage (ops/sym_dia.py).

CG solves SPD systems, so storing only main+upper diagonals is always
legal; at the headline scale the solve is HBM-bound and the half-band
halves the dominant traffic term.  These tests pin the mirror-spill
Pallas kernel (interpret mode) and the solver path against the full
DIA formulation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.ops.sym_dia import (
    SymDiaOperator,
    sym_dia_spmv,
    sym_dia_spmv2,
)


@pytest.mark.parametrize("n,k,tile", [(5000, 8, 1024), (4096, 32, 2048),
                                      (1000, 3, 256), (2048, 64, 512)])
def test_kernel_matches_full_dia(n, k, tile):
    op, b, _ = cgt.banded_model(n, k=k)
    sym, b2, _ = cgt.banded_model(n, k=k, fmt="symdia")
    np.testing.assert_allclose(np.asarray(b), np.asarray(b2), rtol=1e-14)
    v = np.random.default_rng(0).standard_normal(n)
    y_ref = np.asarray(op.mv(jnp.asarray(v)))
    scale = np.abs(y_ref).max()
    data = jnp.asarray(np.asarray(sym.data))
    y = np.asarray(sym_dia_spmv(sym.offsets, data, jnp.asarray(v),
                                tile=tile, interpret=True))
    np.testing.assert_allclose(y, y_ref, atol=1e-12 * scale)
    ya, yb = sym_dia_spmv2(sym.offsets, data, jnp.asarray(v),
                           jnp.asarray(2 * v), tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(ya), y_ref, atol=1e-12 * scale)
    np.testing.assert_allclose(np.asarray(yb), 2 * y_ref, atol=1e-12 * scale)


def test_xla_fallback_and_protocol():
    sym, b, x_true = cgt.banded_model(3000, k=6, fmt="symdia")
    full, _, _ = cgt.banded_model(3000, k=6)
    v = np.random.default_rng(1).standard_normal(3000)
    np.testing.assert_allclose(
        np.asarray(sym.mv(jnp.asarray(v))),
        np.asarray(full.mv(jnp.asarray(v))), rtol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(sym.diagonal()),
                               np.asarray(full.diagonal()))
    assert sym.nnz == full.nnz
    np.testing.assert_allclose(np.asarray(sym.todense()),
                               np.asarray(full.todense()), atol=1e-14)


def test_solve_through_symdia():
    sym, b, x_true = cgt.banded_model(4096, k=8, kappa=1000.0, fmt="symdia")
    res = cgt.solve(sym, b, variant="pipe_pr_cg", rtol=1e-10, max_iter=2000,
                    dtype=np.float64)
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8, err


def test_run_history_matches_dia():
    """Same algorithm, same rounding class: histories agree to roundoff
    in the well-conditioned phase."""
    full, b, x_true = cgt.banded_model(2048, k=8, kappa=100.0)
    sym, _, _ = cgt.banded_model(2048, k=8, kappa=100.0, fmt="symdia")
    kw = dict(max_iter=40, probes=("updated_residual_2_norm",),
              dtype=np.float64)
    h_full = cgt.run("hs_cg", full, b, **kw)["updated_residual_2_norm"]
    h_sym = cgt.run("hs_cg", sym, b, **kw)["updated_residual_2_norm"]
    np.testing.assert_allclose(h_sym[:20], h_full[:20], rtol=1e-10)
