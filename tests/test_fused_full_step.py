"""Whole-iteration fused pipe-step kernel parity (interpret mode).

The full-step kernel (``ops/fused_step.py:fused_pipe_full_step``) must be
semantically identical to the split path: ``generic_pipe_vector_phase``
followed by ``mv2`` (recompute) / ``mv`` (no recompute).  Also checks the
solver-level wiring: a pipe_pr run with ``NCGV_FULL_FUSED=1`` (interpret
mode off-TPU) reproduces the default run's history.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model
from new_cg_variants_tpu.ops.fused_step import (
    fused_pipe_full_step,
    supports_full_step,
)
from new_cg_variants_tpu.solvers.context import Context, generic_pipe_vector_phase


def _rand_state(n, rng):
    return {k: jnp.asarray(rng.standard_normal(n)) for k in "xrwups"}


@pytest.mark.parametrize("recompute", [True, False])
@pytest.mark.parametrize("n,k", [(8192, 3), (8192, 32)])
def test_full_step_matches_split(n, k, recompute):
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    assert supports_full_step(op.offsets, n)
    rng = np.random.default_rng(n + k)
    sv = _rand_state(n, rng)
    a1 = jnp.asarray(0.37)
    beta = jnp.asarray(0.12)

    ctx = Context(op)
    x2, r2, w2, p2, s2, dots = generic_pipe_vector_phase(
        ctx, sv["x"], sv["r"], sv["w"], sv["u"], sv["p"], sv["s"], a1, beta
    )
    if recompute:
        u_ref, w_ref = op.mv2(s2, r2)
    else:
        u_ref, w_ref = op.mv(s2), w2

    fx, fr, fw, fp, fs, fu, fdots = fused_pipe_full_step(
        op.offsets, op.data, sv["x"], sv["r"], sv["w"], sv["u"], sv["p"],
        sv["s"], a1, beta, recompute=recompute, interpret=True,
    )
    tol = dict(rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(x2), **tol)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(r2), **tol)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(p2), **tol)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(s2), **tol)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(u_ref), **tol)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(w_ref), **tol)
    for got, ref in zip(fdots, dots):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


@pytest.mark.parametrize("variant", ["pipe_pr_cg", "pipe_p_cg"])
def test_solver_path_with_full_fusion(variant, monkeypatch):
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
    # Early iterations must agree tightly; later ones only to within the
    # rounding-divergence envelope (the kernel's lane-tiled dot order
    # differs from vdot's, and CG trajectories amplify ulp differences —
    # the same envelope the golden-parity tests allow vs the reference).
    np.testing.assert_allclose(res_f[:8], res_r[:8], rtol=1e-9)
    ratio = res_f / res_r
    assert np.all((ratio > 0.25) & (ratio < 4.0)), ratio


def _rand_prec_state(n, rng):
    keys = ["x", "r", "w", "u", "p", "s", "rt", "st", "wt", "ut"]
    return {k: jnp.asarray(rng.standard_normal(n)) for k in keys}


@pytest.mark.parametrize("recompute", [True, False])
def test_full_step_prec_matches_generic(recompute):
    """Jacobi-preconditioned whole-iteration kernel == generic branch."""
    from new_cg_variants_tpu.ops.fused_step import fused_pipe_full_step_prec
    from new_cg_variants_tpu.solvers.precond import JacobiPreconditioner

    n, k = 4096, 5
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    prec = JacobiPreconditioner.from_operator(op)
    rng = np.random.default_rng(7)
    sv = _rand_prec_state(n, rng)
    a1 = jnp.asarray(0.37)
    beta = jnp.asarray(0.12)

    # generic preconditioned branch (families.make_pipe_step fallback)
    x2 = sv["x"] + a1 * sv["p"]
    r2 = sv["r"] - a1 * sv["s"]
    w2 = sv["w"] - a1 * sv["u"]
    rt2 = sv["rt"] - a1 * sv["st"]
    wt2 = sv["wt"] - a1 * sv["ut"]
    p2 = rt2 + beta * sv["p"]
    s2 = w2 + beta * sv["s"]
    st2 = wt2 + beta * sv["st"]
    mu, delta, gamma, nu = (
        jnp.vdot(p2, s2), jnp.vdot(r2, st2), jnp.vdot(st2, s2), jnp.vdot(rt2, r2),
    )
    if recompute:
        u_ref, w_ref = op.mv2(st2, rt2)
        wt_ref = prec.apply(w_ref)
    else:
        u_ref, w_ref, wt_ref = op.mv(st2), w2, wt2
    ut_ref = prec.apply(u_ref)

    fx, fr, fw, fp, fs, fu, frt, fst, fwt, fut, fdots = fused_pipe_full_step_prec(
        op.offsets, op.data, prec.inv_diag,
        sv["x"], sv["r"], sv["w"], sv["u"], sv["p"], sv["s"],
        sv["rt"], sv["st"], sv["wt"], sv["ut"],
        a1, beta, recompute=recompute, interpret=True,
    )
    tol = dict(rtol=1e-12, atol=1e-12)
    for got, ref in [
        (fx, x2), (fr, r2), (fw, w_ref), (fp, p2), (fs, s2), (fu, u_ref),
        (frt, rt2), (fst, st2), (fwt, wt_ref), (fut, ut_ref),
    ]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)
    for got, ref in zip(fdots, (mu, delta, gamma, nu)):
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)


def test_vector_phase_prec_matches_generic():
    from new_cg_variants_tpu.ops.fused_step import fused_pipe_vector_phase_prec

    n = 4096
    rng = np.random.default_rng(11)
    sv = _rand_prec_state(n, rng)
    a1 = jnp.asarray(0.21)
    beta = jnp.asarray(0.43)

    x2 = sv["x"] + a1 * sv["p"]
    r2 = sv["r"] - a1 * sv["s"]
    w2 = sv["w"] - a1 * sv["u"]
    rt2 = sv["rt"] - a1 * sv["st"]
    wt2 = sv["wt"] - a1 * sv["ut"]
    p2 = rt2 + beta * sv["p"]
    s2 = w2 + beta * sv["s"]
    st2 = wt2 + beta * sv["st"]

    got = fused_pipe_vector_phase_prec(
        sv["x"], sv["r"], sv["w"], sv["u"], sv["p"], sv["s"],
        sv["rt"], sv["st"], sv["wt"], sv["ut"], a1, beta, interpret=True,
    )
    gx, gr, gw, grt, gwt, gp, gs, gst, gdots = got
    tol = dict(rtol=1e-12, atol=1e-12)
    for g, ref in [(gx, x2), (gr, r2), (gw, w2), (grt, rt2), (gwt, wt2),
                   (gp, p2), (gs, s2), (gst, st2)]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref), **tol)
    refs = (jnp.vdot(p2, s2), jnp.vdot(r2, st2), jnp.vdot(st2, s2),
            jnp.vdot(rt2, r2))
    for g, ref in zip(gdots, refs):
        np.testing.assert_allclose(float(g), float(ref), rtol=1e-12)


@pytest.mark.parametrize("variant", ["pipe_pr_pcg", "pipe_p_pcg"])
def test_solver_path_prec_full_fusion(variant, monkeypatch):
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
    # tight agreement before the attainable-accuracy floor (~1e-12 rel by
    # iter 4 on this easy problem), rounding-divergence envelope after
    np.testing.assert_allclose(res_f[:3], res_r[:3], rtol=1e-7)
    ratio = res_f / res_r
    assert np.all((ratio > 0.25) & (ratio < 4.0)), ratio


def test_prec_gating(monkeypatch):
    """Fused prec step requires Jacobi; norm-in-batch falls back."""
    from new_cg_variants_tpu.solvers.precond import (
        IdentityPreconditioner,
        JacobiPreconditioner,
    )

    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=1e4)
    sv = {k: jnp.zeros(n) for k in
          ("x", "r", "w", "u", "p", "s", "rt", "st", "wt", "ut")}
    a1 = jnp.asarray(1.0)
    beta = jnp.asarray(0.0)

    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    ctx = Context(op, JacobiPreconditioner.from_operator(op))
    assert ctx.pipe_full_step_prec(sv, a1, beta, True) is not None
    # non-Jacobi preconditioner: no fused path
    ctx_id = Context(op, IdentityPreconditioner())
    assert ctx_id.pipe_full_step_prec(sv, a1, beta, True) is None
    # norm-in-batch (extra_norm) must fall back to the generic path
    ctx.extra_norm = "r"
    assert ctx.pipe_full_step_prec(sv, a1, beta, True) is None


def test_gating(monkeypatch):
    """Unsupported shapes / env kill-switch fall back to None."""
    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=1e4)
    ctx = Context(op)
    sv = {k: jnp.zeros(n) for k in "xrwups"}
    a1 = jnp.asarray(1.0)
    beta = jnp.asarray(0.0)

    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    assert ctx.pipe_full_step(sv, a1, beta, True) is not None
    monkeypatch.setenv("NCGV_FULL_FUSED", "0")
    assert ctx.pipe_full_step(sv, a1, beta, True) is None
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    monkeypatch.setenv("NCGV_DISABLE_PALLAS", "1")
    assert ctx.pipe_full_step(sv, a1, beta, True) is None
    monkeypatch.delenv("NCGV_DISABLE_PALLAS")
    # ragged n: not tile-aligned
    sv_r = {k: jnp.zeros(n + 1) for k in "xrwups"}
    assert ctx.pipe_full_step(sv_r, a1, beta, True) is None
