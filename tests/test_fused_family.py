"""Fused 1-matvec family kernels parity (interpret mode).

Each kernel in ``ops/fused_family.py`` must be semantically identical to
the family's generic formulation (``solvers/families.py``): same update
order, same matvec, same dot values.  Solver-level wiring: each variant
run with ``NCGV_FULL_FUSED=1`` reproduces the default run's history.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model
from new_cg_variants_tpu.ops.fused_family import (
    fused_cgcg_matvec_phase,
    fused_gv_matvec_phase,
    fused_hs_matvec_phase,
    fused_pr_full_step,
)
from new_cg_variants_tpu.solvers.context import Context


def _vecs(n, rng, count):
    return [jnp.asarray(rng.standard_normal(n)) for _ in range(count)]


TOL = dict(rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,k", [(4096, 3), (8192, 32)])
def test_pr_full_step_matches_generic(n, k):
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(n + k)
    x, r, p, s = _vecs(n, rng, 4)
    a1, beta = jnp.asarray(0.37), jnp.asarray(0.12)

    # generic unprec pr_step body (families.make_pr_step fallback)
    x2 = x + a1 * p
    r2 = r - a1 * s
    p2 = r2 + beta * p
    s2 = op.mv(p2)
    refs = (jnp.vdot(p2, s2), jnp.vdot(r2, s2), jnp.vdot(s2, s2),
            jnp.vdot(r2, r2))

    fx, fr, fp, fs, fdots = fused_pr_full_step(
        op.offsets, op.data, x, r, p, s, a1, beta, interpret=True
    )
    for got, ref in [(fx, x2), (fr, r2), (fp, p2), (fs, s2)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_cgcg_matvec_phase_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(5)
    x, r, p, s = _vecs(n, rng, 4)
    a1 = jnp.asarray(0.37)

    x2 = x + a1 * p
    r2 = r - a1 * s
    w2 = op.mv(r2)
    refs = (jnp.vdot(r2, r2), jnp.vdot(w2, r2))

    fx, fr, fw, fdots = fused_cgcg_matvec_phase(
        op.offsets, op.data, x, r, p, s, a1, interpret=True
    )
    for got, ref in [(fx, x2), (fr, r2), (fw, w2)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_gv_matvec_phase_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(6)
    x, r, w, u, p, s = _vecs(n, rng, 6)
    a1 = jnp.asarray(0.37)

    x2 = x + a1 * p
    r2 = r - a1 * s
    w2 = w - a1 * u
    t = op.mv(w2)
    refs = (jnp.vdot(r2, r2), jnp.vdot(w2, r2))

    fx, fr, fw, ft, fdots = fused_gv_matvec_phase(
        op.offsets, op.data, x, r, w, u, p, s, a1, interpret=True
    )
    for got, ref in [(fx, x2), (fr, r2), (fw, w2), (ft, t)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_hs_matvec_phase_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(8)
    r, p = _vecs(n, rng, 2)
    beta = jnp.asarray(0.12)

    p2 = r + beta * p
    s2 = op.mv(p2)
    mu_ref = jnp.vdot(p2, s2)

    fp, fs, (fmu,) = fused_hs_matvec_phase(
        op.offsets, op.data, r, p, beta, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fp), np.asarray(p2), **TOL)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(s2), **TOL)
    np.testing.assert_allclose(float(fmu), float(mu_ref), rtol=1e-12)


@pytest.mark.parametrize(
    "variant", ["hs_cg", "cg_cg", "gv_cg", "pr_cg", "m_cg"]
)
def test_solver_path_with_family_fusion(variant, monkeypatch):
    from new_cg_variants_tpu.solvers.api import run

    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=1e4)
    kw = dict(max_iter=40, probes=("updated_residual_2_norm",))

    out_ref = run(variant, op, b, **kw)
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    out_fused = run(variant, op, b, **kw)

    res_f = np.asarray(out_fused["updated_residual_2_norm"])
    res_r = np.asarray(out_ref["updated_residual_2_norm"])
    # early iterations agree tightly; later only within the
    # rounding-divergence envelope (lane-tiled dot order vs vdot)
    np.testing.assert_allclose(res_f[:8], res_r[:8], rtol=1e-9)
    ratio = res_f / res_r
    assert np.all((ratio > 0.25) & (ratio < 4.0)), ratio


@pytest.mark.parametrize(
    "variant", ["hs_cg", "cg_cg", "gv_cg", "pr_cg", "m_cg"]
)
def test_solve_with_family_fusion_converges(variant, monkeypatch):
    """tolerance_loop (production) path under full fusion: same answer."""
    from new_cg_variants_tpu.solvers.api import solve

    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=100.0)
    res_ref = solve(op, b, variant=variant, rtol=1e-10, max_iter=300)
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    res_f = solve(op, b, variant=variant, rtol=1e-10, max_iter=300)
    assert res_f.converged and res_ref.converged
    # the two formulations round differently by design; near the exit
    # threshold a few iterations of slack is roundoff, not a regression
    assert abs(int(res_f.iterations) - int(res_ref.iterations)) <= 5
    np.testing.assert_allclose(
        np.asarray(res_f.x), np.asarray(res_ref.x), rtol=1e-7, atol=1e-9
    )


def test_family_gating(monkeypatch):
    """Kill-switches and unsupported configs fall back to None."""
    n = 4096
    op, _, _ = banded_model(n, k=4, kappa=1e4)
    ctx = Context(op)
    sv = {k: jnp.zeros(n) for k in "xrwups"}
    a1 = jnp.asarray(1.0)
    beta = jnp.asarray(0.0)

    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    assert ctx.pr_full_step(sv, a1, beta) is not None
    assert ctx.cgcg_matvec_phase(sv, a1) is not None
    assert ctx.gv_matvec_phase(sv, a1) is not None
    assert ctx.hs_matvec_phase(sv["r"], sv["p"], beta) is not None
    monkeypatch.setenv("NCGV_FULL_FUSED", "0")
    assert ctx.pr_full_step(sv, a1, beta) is None
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    monkeypatch.setenv("NCGV_DISABLE_PALLAS", "1")
    assert ctx.gv_matvec_phase(sv, a1) is None
    monkeypatch.delenv("NCGV_DISABLE_PALLAS")
    # norm-in-batch rho: generic path only
    ctx.extra_norm = "r"
    assert ctx.hs_matvec_phase(sv["r"], sv["p"], beta) is None


# ---------------------------------------------------------------------------
# Jacobi-preconditioned twins
# ---------------------------------------------------------------------------

from new_cg_variants_tpu.ops.fused_family import (  # noqa: E402
    fused_cgcg_matvec_phase_prec,
    fused_gv_matvec_phase_prec,
    fused_pr_full_step_prec,
)
from new_cg_variants_tpu.solvers.precond import JacobiPreconditioner  # noqa: E402


def test_pr_full_step_prec_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    prec = JacobiPreconditioner.from_operator(op)
    rng = np.random.default_rng(13)
    x, r, p, s, rt, st = _vecs(n, rng, 6)
    a1, beta = jnp.asarray(0.37), jnp.asarray(0.12)

    # generic preconditioned pr_step body
    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = rt - a1 * st
    p2 = rt2 + beta * p
    s2 = op.mv(p2)
    st2 = prec.apply(s2)
    refs = (jnp.vdot(p2, s2), jnp.vdot(r2, st2), jnp.vdot(st2, s2),
            jnp.vdot(rt2, r2))

    fx, fr, frt, fp, fs, fst, fdots = fused_pr_full_step_prec(
        op.offsets, op.data, prec.inv_diag, x, r, p, s, rt, st, a1, beta,
        interpret=True,
    )
    for got, ref in [(fx, x2), (fr, r2), (frt, rt2), (fp, p2), (fs, s2),
                     (fst, st2)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_cgcg_matvec_phase_prec_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    prec = JacobiPreconditioner.from_operator(op)
    rng = np.random.default_rng(14)
    x, r, p, s = _vecs(n, rng, 4)
    a1 = jnp.asarray(0.37)

    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = prec.apply(r2)
    w2 = op.mv(rt2)
    refs = (jnp.vdot(r2, rt2), jnp.vdot(w2, rt2))

    fx, fr, frt, fw, fdots = fused_cgcg_matvec_phase_prec(
        op.offsets, op.data, prec.inv_diag, x, r, p, s, a1, interpret=True,
    )
    for got, ref in [(fx, x2), (fr, r2), (frt, rt2), (fw, w2)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_gv_matvec_phase_prec_matches_generic():
    n, k = 8192, 16
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    prec = JacobiPreconditioner.from_operator(op)
    rng = np.random.default_rng(15)
    x, r, w, u, p, s, rt, st = _vecs(n, rng, 8)
    a1 = jnp.asarray(0.37)

    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = rt - a1 * st
    w2 = w - a1 * u
    wt2 = prec.apply(w2)
    t = op.mv(wt2)
    refs = (jnp.vdot(r2, rt2), jnp.vdot(w2, rt2))

    fx, fr, frt, fw, fwt, ft, fdots = fused_gv_matvec_phase_prec(
        op.offsets, op.data, prec.inv_diag, x, r, w, u, p, s, rt, st, a1,
        interpret=True,
    )
    for got, ref in [(fx, x2), (fr, r2), (frt, rt2), (fw, w2), (fwt, wt2),
                     (ft, t)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
    for got, ref in zip(fdots, refs):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


@pytest.mark.parametrize(
    "variant", ["hs_pcg", "cg_pcg", "gv_pcg", "pr_pcg", "m_pcg"]
)
def test_solver_path_prec_family_fusion(variant, monkeypatch):
    from new_cg_variants_tpu.solvers.api import run

    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=1e4)
    kw = dict(max_iter=40, preconditioner="jacobi",
              probes=("updated_residual_2_norm",))

    out_ref = run(variant, op, b, **kw)
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    out_fused = run(variant, op, b, **kw)

    res_f = np.asarray(out_fused["updated_residual_2_norm"])
    res_r = np.asarray(out_ref["updated_residual_2_norm"])
    # tight agreement before the easy problem's fast convergence hits
    # the rounding floor (~1e-9 rel by iter 4), envelope after.  The
    # Meurant nu-recurrence breaks down (NaN) past the floor in BOTH
    # formulations — compare the common finite prefix and require the
    # breakdown onset (if any) to roughly coincide.
    np.testing.assert_allclose(res_f[:3], res_r[:3], rtol=1e-7)
    # both formulations must reach the same attainable floor; the
    # breakdown ONSET (nan index) is cancellation-chaotic and may differ
    floor_f = np.nanmin(res_f[np.isfinite(res_f)])
    floor_r = np.nanmin(res_r[np.isfinite(res_r)])
    assert 0.1 < floor_f / floor_r < 10.0, (floor_f, floor_r)
