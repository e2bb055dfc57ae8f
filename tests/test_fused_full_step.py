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
@pytest.mark.parametrize("n,k", [(4096, 3), (8192, 32)])
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


def test_gating(monkeypatch):
    """Unsupported shapes / env kill-switch fall back to None."""
    n = 4096
    op, b, _ = banded_model(n, k=4, kappa=1e4)
    ctx = Context(op)
    sv = {k: jnp.zeros(n) for k in "xrwups"}
    a1 = jnp.asarray(1.0)
    beta = jnp.asarray(0.0)

    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    assert ctx.pipe_full_step(sv, a1, beta, True) is not None
    monkeypatch.setenv("NCGV_FULL_FUSED", "0")
    assert ctx.pipe_full_step(sv, a1, beta, True) is None
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_DISABLE_PALLAS", "1")
    assert ctx.pipe_full_step(sv, a1, beta, True) is None
    monkeypatch.delenv("NCGV_DISABLE_PALLAS")
    # ragged n: not tile-aligned
    sv_r = {k: jnp.zeros(n + 1) for k in "xrwups"}
    assert ctx.pipe_full_step(sv_r, a1, beta, True) is None
