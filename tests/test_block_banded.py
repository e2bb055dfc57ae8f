"""Block-banded (MXU) general-sparse operator tests.

The TPU-native answer to gather-bound general SpMV (ops/block_banded.py):
RCM/natural-order band packing + batched block-tridiagonal matmul.
Covers packing correctness, the protocol surface (mv/mv2/diagonal), and
an end-to-end permuted solve on a real fixture (the reference consumes
general fixtures through scipy CSR, numerical_experiments/exact_cg.py).
"""

import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.matio.matrix_market import CooMatrix
from new_cg_variants_tpu.ops.block_banded import block_banded_from_coo


def _random_banded_coo(n, bw, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        lo, hi = max(0, i - bw), min(n, i + bw + 1)
        js = lo + rng.choice(hi - lo, size=min(4, hi - lo), replace=False)
        for j in js:
            v = rng.standard_normal() * 0.1
            rows += [i, j]
            cols += [j, i]
            vals += [v, v]  # symmetric
        rows.append(i)
        cols.append(i)
        vals.append(10.0)  # diagonally dominant
    return CooMatrix((n, n), np.array(rows), np.array(cols),
                     np.array(vals, dtype=np.float64))


def test_block_banded_matches_dense():
    coo = _random_banded_coo(700, 90, seed=1)
    op, perm = block_banded_from_coo(coo, dtype=np.float64)
    a = coo.toarray()[np.ix_(perm, perm)]
    n = a.shape[0]
    assert op.n_orig == n and op.n % op.bs == 0

    rng = np.random.default_rng(2)
    v = np.zeros(op.n)
    w = np.zeros(op.n)
    v[:n] = rng.standard_normal(n)
    w[:n] = rng.standard_normal(n)

    y = np.asarray(op.mv(v))
    np.testing.assert_allclose(y[:n], a @ v[:n], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(y[n:], v[n:], rtol=1e-12)  # unit pad diag

    y2a, y2b = op.mv2(v, w)
    np.testing.assert_allclose(np.asarray(y2a)[:n], a @ v[:n], rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(y2b)[:n], a @ w[:n], rtol=1e-12,
                               atol=1e-12)

    d = np.asarray(op.diagonal())
    np.testing.assert_allclose(d[:n], np.diagonal(a), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op.todense()), a, rtol=1e-12,
                               atol=1e-12)


def test_block_banded_reorder_picks_tighter_band():
    # 1138_bus: natural bandwidth 1030, RCM 141 — auto must pick RCM
    coo = cgt.load_matrix("1138_bus")
    op, perm = block_banded_from_coo(coo, dtype=np.float64)
    assert op.bs <= 256  # RCM band 141 -> 256-lane block
    assert not np.array_equal(perm, np.arange(coo.shape[0]))


def test_block_banded_solve_parity():
    """pipe_pr_pcg on the permuted block-banded system reproduces the
    dense-operator history (same matrix, same preconditioner)."""
    coo = cgt.load_matrix("1138_bus")
    n = coo.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = coo.tocsr() @ x_true

    op, perm = block_banded_from_coo(coo, dtype=np.float64)
    b_pad = np.zeros(op.n)
    b_pad[:n] = b[perm]

    out = cgt.run("pipe_pr_pcg", op, b_pad, max_iter=60,
                  preconditioner="jacobi",
                  probes=("updated_residual_2_norm",), dtype=np.float64)
    ref = cgt.run("pipe_pr_pcg", coo.toarray(), b, max_iter=60,
                  preconditioner="jacobi",
                  probes=("updated_residual_2_norm",), dtype=np.float64)
    # same spectrum (permutation similarity) -> same natural-norm history
    # up to reduction roundoff
    np.testing.assert_allclose(
        out["updated_residual_2_norm"][:25],
        ref["updated_residual_2_norm"][:25], rtol=1e-8,
    )
    # un-permute the solution: at equal (unconverged — kappa ~1e7 at 60
    # iters) depth, the block-banded run's forward error must match the
    # dense run's within roundoff-decorrelation slack
    x = np.empty(n)
    x[perm] = np.asarray(out["x"])[:n]
    e_bb = np.linalg.norm(x - x_true)
    e_dn = np.linalg.norm(np.asarray(ref["x"]) - x_true)
    assert 0.5 < e_bb / e_dn < 2.0
