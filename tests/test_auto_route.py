"""Auto-routing of general sparse matrices (VERDICT r3 task 6).

``from_coo(fmt='auto')`` must send bandwidth-reducible general matrices
to the block-banded MXU formulation transparently (original coordinates,
same b/x) and fall back to gather-ELL with a LOUD warning only when the
RCM band is unaffordable — the policy replacing PETSc ``mpiaij``'s
accept-anything behavior with a TPU-appropriate restructuring step.
"""

import warnings

import jax
import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.matio.matrix_market import CooMatrix
from new_cg_variants_tpu.ops.block_banded import PermutedBlockBandedOperator
from new_cg_variants_tpu.ops.operators import EllOperator, choose_format, from_coo


@pytest.fixture(scope="module")
def mesh8():
    from new_cg_variants_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_bcsstk18_routes_to_block_banded():
    coo = cgt.load_matrix("bcsstk18")
    assert choose_format(coo) == "block_banded"
    op = from_coo(coo, fmt="auto", dtype=np.float64)
    assert isinstance(op, PermutedBlockBandedOperator)
    assert op.n == coo.shape[0]
    a = coo.tocsr()
    v = np.random.default_rng(0).standard_normal(op.n)
    got = np.asarray(op.mv(v))
    want = a @ v
    # different summation order than CSR; scale atol to the row magnitudes
    np.testing.assert_allclose(got, want, rtol=1e-9,
                               atol=1e-9 * np.abs(want).max())


def test_auto_solve_through_permuted_operator():
    coo = cgt.load_matrix("1138_bus")
    op = from_coo(coo, fmt="auto", dtype=np.float64)
    assert isinstance(op, PermutedBlockBandedOperator)
    n = coo.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = coo.tocsr() @ x_true
    res = cgt.solve(op, b, variant="pipe_pr_pcg", preconditioner="jacobi",
                    rtol=1e-10, max_iter=4000, dtype=np.float64)
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-6, err


def _random_irreducible_coo(n=4096, per_row=6, seed=0):
    """Uniformly random pattern: RCM cannot reduce the O(n) band."""
    rng = np.random.default_rng(seed)
    col = rng.integers(0, n, size=(n, per_row))
    row = np.repeat(np.arange(n), per_row)
    col = col.ravel()
    # symmetrize + diagonal dominance for SPD-ishness
    rows = np.concatenate([row, col, np.arange(n)])
    cols = np.concatenate([col, row, np.arange(n)])
    vals = np.concatenate([np.full(2 * n * per_row, 0.01),
                           np.full(n, float(2 * per_row))])
    return CooMatrix(shape=(n, n), row=rows, col=cols, val=vals)


def test_irreducible_matrix_warns_and_falls_back_to_ell():
    coo = _random_irreducible_coo()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fmt = choose_format(coo, max_padded_values=1_000_000)
    assert fmt == "ell"
    assert any("gather-ELL" in str(x.message) for x in w)
    op = from_coo(coo, fmt=fmt, dtype=np.float64)
    assert isinstance(op, EllOperator)


def test_run_hoists_permutation_and_returns_original_coords():
    """run() solves in the reordered basis (no per-iteration permutation
    gathers) but every output — x and vector probe histories — comes
    back in ORIGINAL coordinates at the ORIGINAL dimension."""
    coo = cgt.load_matrix("1138_bus")
    op = from_coo(coo, fmt="auto", dtype=np.float64)
    n = coo.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = coo.tocsr() @ x_true
    out = cgt.run("hs_pcg", op, b, max_iter=900, preconditioner="jacobi",
                  probes=("error_A_norm", "save_x"), x_true=x_true)
    assert out["save_x"].shape == (900, n)
    err = np.linalg.norm(out["x"] - x_true) / np.linalg.norm(x_true)
    assert err < 1e-6, err
    # final save_x row must equal the returned x (both original coords)
    np.testing.assert_allclose(out["save_x"][-1], np.asarray(out["x"]),
                               rtol=1e-12, atol=1e-15)
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    assert np.nanmin(rel) < 1e-5


def test_small_and_banded_routing():
    assert choose_format(cgt.load_matrix("bcsstk03")) == "dense"
    # symmetric + tight band: the half-band storage (half the matrix
    # traffic) is the right default for every such CG input
    assert choose_format(cgt.load_matrix("nos3")) == "symdia"
    assert choose_format(cgt.load_matrix("nos6")) == "symdia"


def test_symmetric_banded_routes_to_symdia():
    from new_cg_variants_tpu.ops.sym_dia import SymDiaOperator

    coo = cgt.load_matrix("nos3")
    op = from_coo(coo, fmt="auto", dtype=np.float64)
    assert isinstance(op, SymDiaOperator)
    assert op.n == coo.shape[0]
    v = np.random.default_rng(0).standard_normal(op.n)
    got = np.asarray(op.mv(v))
    want = coo.tocsr() @ v
    np.testing.assert_allclose(got, want, rtol=1e-11,
                               atol=1e-11 * np.abs(want).max())
    # and it solves through the public API like any other operator
    x_true = np.ones(op.n) / np.sqrt(op.n)
    b = coo.tocsr() @ x_true
    res = cgt.solve(op, b, variant="pipe_pr_pcg", preconditioner="jacobi",
                    rtol=1e-10, max_iter=2000, dtype=np.float64)
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-6, err


def test_asymmetric_banded_still_routes_to_dia():
    """Bitwise symmetry is required for the half-band drop."""
    coo = cgt.load_matrix("nos3")
    val = coo.val.copy()
    # perturb ONE off-diagonal entry asymmetrically
    off = np.flatnonzero(coo.row != coo.col)[0]
    val[off] = val[off] * (1 + 1e-9)
    from new_cg_variants_tpu.matio.matrix_market import CooMatrix

    coo2 = CooMatrix(shape=coo.shape, row=coo.row, col=coo.col, val=val)
    assert choose_format(coo2) == "dia"


def test_constant_band_routes_to_stencil():
    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import coo_from_scipy
    from new_cg_variants_tpu.ops.stencil import BandedStencilOperator

    op64, b, x_true = banded_model(2000, k=8)
    coo = coo_from_scipy(op64.tocsr())
    assert choose_format(coo) == "stencil"
    op = from_coo(coo, fmt="auto", dtype=np.float64)
    assert isinstance(op, BandedStencilOperator)
    assert op.k == 8
    v = np.random.default_rng(1).standard_normal(2000)
    got = np.asarray(op.mv(v))
    want = coo.tocsr() @ v
    np.testing.assert_allclose(got, want, rtol=1e-9,
                               atol=1e-9 * np.abs(want).max())
    # one non-constant off-band entry must break the stencil route
    val = coo.val.copy()
    off = np.flatnonzero(coo.row != coo.col)[0]
    val[off] *= 2.0
    from new_cg_variants_tpu.matio.matrix_market import CooMatrix

    coo2 = CooMatrix(shape=coo.shape, row=coo.row, col=coo.col, val=val)
    assert choose_format(coo2) == "dia"


def test_scipy_sparse_input_accepted():
    """The reference solvers take scipy CSR directly
    (``cg_variants/hs_cg.py:9``); so does this API."""
    coo = cgt.load_matrix("bcsstk03")
    csr = coo.tocsr()
    n = csr.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = csr @ x_true
    out = cgt.run("hs_pcg", csr, b, max_iter=200, preconditioner="jacobi",
                  probes=("error_A_norm",), x_true=x_true, dtype=np.float64)
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    assert np.nanmin(rel) < 1e-10
    res = cgt.solve(csr, b, variant="pipe_pr_pcg", preconditioner="jacobi",
                    rtol=1e-8, max_iter=500, dtype=np.float64)
    assert res.converged
    # and in f32x2 mode
    out2 = cgt.run("hs_pcg", csr, b, max_iter=150, preconditioner="jacobi",
                   probes=("error_A_norm",), x_true=x_true, dtype="f32x2")
    rel2 = out2["error_A_norm"] / out2["error_A_norm"][0]
    # 150 iterations is mid-descent on bcsstk03 (floor needs ~200+);
    # well below the plain-f32 floor (~1e-5.5) proves f32x2 engaged
    assert np.nanmin(rel2) < 1e-6


def _shuffled_banded_coo(n=4096, k=100, seed=3):
    """Banded SPD matrix under a random symmetric permutation: the auto
    policy must RCM it back to a tight band and pick block_banded."""
    rng = np.random.default_rng(seed)
    i = np.repeat(np.arange(n), 3)
    offs = np.tile(np.array([-k, 0, k]), n)
    j = i + offs
    keep = (j >= 0) & (j < n)
    i, j = i[keep], j[keep]
    vals = np.where(i == j, 4.0, -1.0)
    p = rng.permutation(n)
    return CooMatrix(shape=(n, n), row=p[i], col=p[j], val=vals)


def test_distributed_auto_route(mesh8):
    """Auto-routed operators compose with the distributed layer: the
    permutation is hoisted to the host boundary and the inner
    block-banded operator shards by block rows."""
    import warnings

    from new_cg_variants_tpu.parallel import dist_solve

    coo = _shuffled_banded_coo()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        op = from_coo(coo, fmt="auto", dtype=np.float64)
    assert isinstance(op, PermutedBlockBandedOperator)
    n = coo.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = coo.tocsr() @ x_true
    res = dist_solve(op, b, variant="pipe_pr_cg", mesh=mesh8, rtol=1e-10,
                     max_iter=2000, dtype=np.float64)
    assert res.converged
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8, err
