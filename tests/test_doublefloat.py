"""Double-word (f32x2) arithmetic mode: the on-chip f64 substitute.

The reference runs its numerical experiments in NumPy float64
(``numerical_experiments/figure_gen.py:53-55``); TPUs have no f64 path,
so ``dtype="f32x2"`` carries vectors/scalars as two-float pairs and the
operator as an EXACT three-word split (:mod:`new_cg_variants_tpu.ops.
doublefloat`).  These tests pin (a) primitive accuracy, (b) the
compensated SpMV against the f64 CSR, and (c) the end-to-end convergence
fidelity targets: iterations-to-1e-5 within ~2% of f64 and best-accuracy
digits within ~1.5 of f64 on the reference fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.ops.doublefloat import (
    DF,
    df_dot,
    df_operator,
    df_split,
    df_split3,
)


def test_df_split3_is_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 50)) * np.exp(rng.uniform(-30, 30, (50, 50)))
    hi, lo, lo2 = df_split3(a)
    recon = (np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
             + np.asarray(lo2, np.float64))
    np.testing.assert_array_equal(recon, a)


def test_df_arithmetic_eps2_accuracy():
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(2000)
    y64 = rng.standard_normal(2000)
    x, y = df_split(x64), df_split(y64)
    a = df_split(np.float64(0.7324821094721))
    z = x + a * y
    z64 = x64 + 0.7324821094721 * y64
    # absolute error ~eps_df^2-class; relative can blow up at cancellation
    assert np.abs(z.value64() - z64).max() < 1e-12
    d = df_dot(x, y)
    assert abs(d.value64() - x64 @ y64) / abs(x64 @ y64) < 1e-13
    q = (a / df_split(np.float64(3.14159))).value64()
    assert abs(q - 0.7324821094721 / 3.14159) < 1e-14


@pytest.mark.parametrize("fmt", ["dense", "dia", "ell"])
def test_df_operator_mv_matches_f64(fmt):
    coo = cgt.load_matrix("bcsstk03")
    op = df_operator(coo, fmt=fmt)
    a64 = coo.tocsr().toarray()
    rng = np.random.default_rng(2)
    v64 = rng.standard_normal(a64.shape[0])
    v = df_split(v64)
    got = op.mv(v).value64()
    want = a64 @ (np.asarray(v.hi, np.float64) + np.asarray(v.lo, np.float64))
    err = np.abs(got - want) / np.maximum(np.abs(want), np.abs(want).max() * 1e-6)
    assert err.max() < 1e-11, f"{fmt}: {err.max():.2e}"


def _metrics(out):
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    return int(np.argmin(rel > 1e-5)), float(np.log10(np.nanmin(rel)))


@pytest.mark.parametrize("variant,matrix,iters",
                         [("hs_pcg", "bcsstk03", 300),
                          ("pipe_pr_pcg", "bcsstk03", 300),
                          ("hs_pcg", "nos4", 150)])
def test_f32x2_convergence_fidelity(variant, matrix, iters):
    """The VERDICT r3 done-criterion, CPU flavor: double-word iteration
    counts within ~2% of f64 and best accuracy within ~1.5 digits."""
    A = cgt.load_matrix(matrix)
    n = A.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = A.tocsr() @ x_true
    kw = dict(max_iter=iters, probes=("error_A_norm",),
              preconditioner="jacobi", x_true=x_true)
    i64, best64 = _metrics(cgt.run(variant, A, b, dtype=np.float64, **kw))
    idf, bestdf = _metrics(cgt.run(variant, A, b, dtype="f32x2", **kw))
    assert abs(idf - i64) <= max(2, 0.02 * i64), (idf, i64)
    assert bestdf <= best64 + 1.8, (bestdf, best64)
    # and it must decisively beat plain f32 (whose floor is ~-5 here)
    assert bestdf < -10


def test_f32x2_unpreconditioned_run():
    op, b, x_true = cgt.banded_model(512, k=4, kappa=100.0)
    out = cgt.run("pipe_pr_cg", op.todense(), np.asarray(b), max_iter=120,
                  probes=("error_A_norm", "nu"), x_true=x_true, dtype="f32x2")
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    assert np.nanmin(rel) < 1e-10
    assert np.isfinite(out["nu"]).all()


def test_f32x2_solve_path():
    op, b, x_true = cgt.banded_model(512, k=4, kappa=100.0)
    res = cgt.solve(op.todense(), np.asarray(b), variant="pipe_pr_cg",
                    rtol=1e-10, max_iter=500, dtype="f32x2")
    assert res.converged
    err = np.linalg.norm(res.x - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8, err


def test_f32x2_gv_w_replace():
    """The reference's gv residual-replacement experiment
    (gv_cg.py:69-72,156-158) in the on-chip accuracy mode: periodic
    w = A*rt replacement must tighten gv's attainable floor relative to
    the pure-recurrence run (VERDICT r4 task 6)."""
    coo = cgt.load_matrix("bcsstk03")
    a = coo.toarray()
    n = a.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = a @ x_true

    kw = dict(max_iter=300, preconditioner="jacobi",
              probes=("error_A_norm",), x_true=x_true, dtype="f32x2")
    out_plain = cgt.run("gv_pcg", a, b, **kw)
    out_rep = cgt.run("gv_pcg", a, b,
                      w_replace=lambda k, view: (k % 10) == 0, **kw)
    rel_plain = out_plain["error_A_norm"] / out_plain["error_A_norm"][0]
    rel_rep = out_rep["error_A_norm"] / out_rep["error_A_norm"][0]
    floor_plain = np.nanmin(rel_plain[np.isfinite(rel_plain)])
    floor_rep = np.nanmin(rel_rep[np.isfinite(rel_rep)])
    # gv loses digits through the w recurrence; replacement recovers them
    assert floor_rep < floor_plain / 10, (floor_rep, floor_plain)
    assert floor_rep < 1e-8


def test_f32x2_gv_w_replace_stateful():
    coo = cgt.load_matrix("bcsstk03")
    a = coo.toarray()
    n = a.shape[0]
    b = a @ (np.ones(n) / np.sqrt(n))

    def policy(k, view, st):
        do = k >= st["next_k"]
        new = dict(next_k=jnp.where(do, st["next_k"] + 10, st["next_k"]),
                   count=st["count"] + do.astype(jnp.int32))
        return do, new

    init = dict(next_k=np.int32(5), count=np.int32(0))
    out = cgt.run("gv_cg", a, b, max_iter=60, w_replace=policy,
                  w_replace_init=init,
                  probes=("updated_residual_2_norm",), dtype="f32x2")
    h = out["updated_residual_2_norm"]
    assert np.isfinite(h[np.isfinite(h)]).any() and h[1] < h[0]


def test_f32x2_user_preconditioner():
    """User-supplied preconditioners in double-word arithmetic: a custom
    DFJacobi object and a raw DF->DF callable both thread through
    (api.py formerly raised NotImplementedError — VERDICT r4 task 6)."""
    from new_cg_variants_tpu.ops.doublefloat import DFJacobi, df_split

    coo = cgt.load_matrix("nos4")
    a = coo.toarray()
    n = a.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = a @ x_true

    # custom inverse diagonal as a DF-aware object
    inv_d = DFJacobi(df_split(1.0 / np.diag(a)))
    out = cgt.run("hs_pcg", a, b, max_iter=120, preconditioner=inv_d,
                  probes=("error_A_norm",), x_true=x_true, dtype="f32x2")
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    assert np.nanmin(rel) < 1e-10

    # and as a raw callable (the reference's arbitrary-callable protocol)
    scale = df_split(1.0 / np.diag(a))
    out2 = cgt.run("pr_pcg", a, b, max_iter=120,
                   preconditioner=lambda v: scale * v,
                   probes=("error_A_norm",), x_true=x_true, dtype="f32x2")
    rel2 = out2["error_A_norm"] / out2["error_A_norm"][0]
    assert np.nanmin(rel2) < 1e-10

    # parity: both must match the builtin 'jacobi' history closely
    out3 = cgt.run("hs_pcg", a, b, max_iter=120, preconditioner="jacobi",
                   probes=("error_A_norm",), x_true=x_true, dtype="f32x2")
    np.testing.assert_allclose(out["error_A_norm"][:20],
                               out3["error_A_norm"][:20], rtol=1e-6)


def test_df_dia_kernel_matches_generic():
    """The Pallas DF DIA kernel (interpret) reproduces the generic EFT
    accumulation to DF accuracy and the exact-split matvec to ~2^-48 of
    the f64 truth.  (hi words are bitwise identical; lo words may differ
    at contraction level in interpret mode, where the kernel body is
    inlined as HLO — on TPU Mosaic compiles the EFT ordering as
    written, pinned by benchmarks/df_kernel_check.json.)"""
    from new_cg_variants_tpu.ops.df_spmv import df_dia_spmv, df_dia_spmv2
    from new_cg_variants_tpu.ops.doublefloat import df_operator, df_split

    op, _, _ = cgt.banded_model(5000, k=8)
    dop = df_operator(op, fmt="dia")
    rng = np.random.default_rng(0)
    v64 = rng.standard_normal(5000)
    w64 = rng.standard_normal(5000)
    v, w = df_split(v64), df_split(w64)

    ref = dop._mv_dia(dop.inner, v)
    got = df_dia_spmv(dop.inner.offsets, dop.inner.data, dop.lo_data,
                      dop.lo2_data, v, interpret=True)
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
    y64 = np.asarray(op.tocsr() @ v64)
    yk = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    assert np.abs(yk - y64).max() / np.abs(y64).max() < 1e-13

    y2, z2 = df_dia_spmv2(dop.inner.offsets, dop.inner.data, dop.lo_data,
                          dop.lo2_data, v, w, interpret=True)
    assert np.array_equal(np.asarray(y2.hi), np.asarray(got.hi))
    z64 = np.asarray(op.tocsr() @ w64)
    zk = np.asarray(z2.hi, np.float64) + np.asarray(z2.lo, np.float64)
    assert np.abs(zk - z64).max() / np.abs(z64).max() < 1e-13


def test_df_dense_kernel_matches_f64():
    """The dense DF kernel (one-device-op EFT matvec for small accuracy
    fixtures) reproduces the f64 truth at double-word accuracy."""
    from new_cg_variants_tpu.ops.df_spmv import (
        df_dense_spmv,
        df_dense_spmv2,
    )
    from new_cg_variants_tpu.ops.doublefloat import df_operator, df_split
    from new_cg_variants_tpu.ops.operators import DenseOperator

    coo = cgt.load_matrix("1138_bus")
    dop = df_operator(coo)  # auto: small general fixture -> dense
    assert isinstance(dop.inner, DenseOperator)
    n = coo.shape[0]
    rng = np.random.default_rng(0)
    v64 = rng.standard_normal(n)
    w64 = rng.standard_normal(n)
    v, w = df_split(v64), df_split(w64)
    a = coo.tocsr()

    y = df_dense_spmv(dop.inner.a, dop.lo_data, dop.lo2_data, v,
                      interpret=True)
    yk = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
    y64 = a @ v64
    assert np.abs(yk - y64).max() / np.abs(y64).max() < 1e-13

    y2, z2 = df_dense_spmv2(dop.inner.a, dop.lo_data, dop.lo2_data, v, w,
                            interpret=True)
    zk = np.asarray(z2.hi, np.float64) + np.asarray(z2.lo, np.float64)
    assert np.abs(zk - (a @ w64)).max() / np.abs(y64).max() < 1e-13


def test_df_operator_symdia_split_is_exact_without_x64(monkeypatch):
    """df_operator(SymDiaOperator) must expand the half-band HOST-side:
    a device round-trip on an x64-disabled process (the TPU default)
    silently truncates the band to f32 BEFORE the three-word split,
    collapsing the accuracy mode to the f32-matrix fixed bias (round-5
    code-review finding, reproduced on the chip env)."""
    from new_cg_variants_tpu.ops.doublefloat import df_operator

    op, _, _ = cgt.banded_model(2048, k=8, kappa=1e4, fmt="symdia")
    dop = df_operator(op)
    lo = float(np.abs(np.asarray(dop.lo_data)).max())
    assert lo > 0, "three-word split collapsed (lo word identically zero)"
    # the split reconstructs the f64 band exactly
    offs, full = op.todia_host()
    rec = (np.asarray(dop.inner.data, np.float64)
           + np.asarray(dop.lo_data, np.float64)
           + np.asarray(dop.lo2_data, np.float64))
    np.testing.assert_array_equal(rec, full)


def test_df_pipe_vector_phase_kernel_matches_generic():
    """The DF pipe vector-phase kernel (5 double-word AXPYs + the 4 sync
    partials in one pass) matches the generic DF formulation at DF
    accuracy in interpret mode."""
    from new_cg_variants_tpu.ops.df_spmv import df_pipe_vector_phase
    from new_cg_variants_tpu.ops.doublefloat import (
        DoubleFloatContext,
        df_operator,
        df_split,
    )
    from new_cg_variants_tpu.solvers.context import generic_pipe_vector_phase

    op, _, _ = cgt.banded_model(5000, k=8)
    ctx = DoubleFloatContext(df_operator(op))
    rng = np.random.default_rng(3)
    x, r, w, u, p, s = [df_split(rng.standard_normal(5000))
                        for _ in range(6)]
    a1 = df_split(np.float64(0.3712345678901234))
    beta = df_split(np.float64(0.1298765432109876))
    ref = generic_pipe_vector_phase(ctx, x, r, w, u, p, s, a1, beta)
    got = df_pipe_vector_phase(x, r, w, u, p, s, a1, beta, interpret=True)
    for i in range(5):
        np.testing.assert_allclose(got[i].value64(), ref[i].value64(),
                                   rtol=1e-13, atol=1e-13)
    for i in range(4):
        np.testing.assert_allclose(got[5][i].value64(),
                                   ref[5][i].value64(), rtol=1e-12)
