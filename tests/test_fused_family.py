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
    assert abs(int(res_f.iterations) - int(res_ref.iterations)) <= 2
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
