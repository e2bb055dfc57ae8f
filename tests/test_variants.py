"""Solver-variant correctness: convergence, twins, numpy parity, solve()."""

import jax.numpy as jnp
import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.solvers.api import VARIANT_NAMES

from conftest import make_spd


@pytest.mark.parametrize("name", VARIANT_NAMES)
def test_variant_converges(name, spd64):
    a = spd64
    x_true = np.linspace(-1, 1, a.shape[0])
    b = a @ x_true
    out = cgt.run(
        name, a, b, max_iter=120,
        probes=("error_A_norm", "updated_residual_2_norm"),
        x_true=x_true, dtype=jnp.float64,
    )
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    # plain pipelined variants (gv, pipe_p*) legitimately lose attainable
    # accuracy — the paper's central finding; recompute variants do not
    lossy = name.startswith("gv") or name.startswith("pipe_p_")
    tol = 3e-6 if lossy else 1e-8
    assert rel[-1] < tol, f"{name} rel A-norm error {rel[-1]:.2e}"


@pytest.mark.parametrize(
    "pair",
    [
        ("hs_cg", "hs_pcg"),
        ("cg_cg", "cg_pcg"),
        ("gv_cg", "gv_pcg"),
        ("pr_cg", "pr_pcg"),
        ("m_cg", "m_pcg"),
        ("pipe_pr_cg", "pipe_pr_pcg"),
        ("pipe_p_m_cg", "pipe_p_m_pcg"),
    ],
)
def test_identity_preconditioned_twin_matches(pair, spd64):
    """With M = I the pcg twin must be FP-identical to the unprec variant
    (same arithmetic, tilde vectors alias the plain ones)."""
    a = spd64
    b = a @ np.ones(a.shape[0])
    u, p = pair
    out_u = cgt.run(u, a, b, max_iter=60, probes=("updated_residual_2_norm", "nu"),
                    dtype=jnp.float64)
    out_p = cgt.run(p, a, b, max_iter=60, probes=("updated_residual_2_norm", "nu"),
                    dtype=jnp.float64)
    np.testing.assert_array_equal(out_u["nu"], out_p["nu"])
    np.testing.assert_array_equal(
        out_u["updated_residual_2_norm"], out_p["updated_residual_2_norm"]
    )


def _numpy_hs_cg(a, b, max_iter):
    """Independent plain-NumPy HS-CG used as a cross-implementation oracle."""
    x = np.zeros_like(b)
    r = b - a @ x
    p = r.copy()
    nu = r @ r
    s = a @ p
    alpha = nu / (p @ s)
    hist = [np.sqrt(nu)]
    for _ in range(1, max_iter):
        x = x + alpha * p
        r = r - alpha * s
        nu_new = r @ r
        beta = nu_new / nu
        nu = nu_new
        p = r + beta * p
        s = a @ p
        alpha = nu / (p @ s)
        hist.append(np.sqrt(nu))
    return x, np.array(hist)


def test_hs_matches_numpy(spd64):
    a = spd64
    b = a @ np.linspace(0, 1, a.shape[0])
    out = cgt.run("hs_cg", a, b, max_iter=60,
                  probes=("updated_residual_2_norm",), dtype=jnp.float64)
    x_np, hist_np = _numpy_hs_cg(b=b, a=a, max_iter=60)
    # identical recurrences in f64; reduction order differs between NumPy
    # (pairwise) and XLA, and trajectories decorrelate chaotically once
    # the residual is tiny — compare the early sweep tightly and the tail
    # to within an order of magnitude
    np.testing.assert_allclose(
        out["updated_residual_2_norm"][:20], hist_np[:20], rtol=1e-9
    )
    ratio = out["updated_residual_2_norm"][-1] / hist_np[-1]
    assert 0.1 < ratio < 10.0


def test_all_single_reduction_variants_track_hs(spd64):
    """The communication-reduced variants should track HS-CG iteration
    counts on a well-conditioned problem (the reference's cross-variant
    parity check, figure_gen.py:107-108)."""
    a = spd64
    x_true = np.ones(a.shape[0]) / 8.0
    b = a @ x_true
    tol = 1e-5

    def iters_to_tol(name):
        out = cgt.run(name, a, b, max_iter=150, probes=("error_A_norm",),
                      x_true=x_true, dtype=jnp.float64)
        rel = out["error_A_norm"] / out["error_A_norm"][0]
        hit = np.argmin(rel > tol)
        assert hit > 0, f"{name} never reached {tol}"
        return hit

    base = iters_to_tol("hs_cg")
    for name in ("cg_cg", "pr_cg", "m_cg", "pipe_pr_cg", "pipe_pr_m_cg", "gv_cg"):
        k = iters_to_tol(name)
        assert k <= 1.15 * base + 2, f"{name}: {k} vs hs {base}"


def test_solve_early_exit(spd64):
    a = spd64
    x_true = np.linspace(1, 2, a.shape[0])
    b = a @ x_true
    res = cgt.solve(a, b, variant="pr_cg", rtol=1e-12, max_iter=500,
                    dtype=jnp.float64)
    assert res.converged
    assert res.iterations < 500
    assert np.linalg.norm(np.asarray(res.x) - x_true) < 1e-7


def test_solve_norm_none_fixed_iters(spd64):
    a = spd64
    b = a @ np.ones(a.shape[0])
    res = cgt.solve(a, b, variant="pipe_pr_cg", norm_type="none", max_iter=37,
                    dtype=jnp.float64)
    assert res.iterations == 37


def test_jacobi_preconditioning_accelerates():
    coo = cgt.load_matrix("bcsstk03")
    a = coo.toarray()
    n = a.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = a @ x_true
    out_plain = cgt.run("hs_cg", a, b, max_iter=250, probes=("error_A_norm",),
                        x_true=x_true, dtype=jnp.float64)
    out_prec = cgt.run("hs_pcg", a, b, max_iter=250, probes=("error_A_norm",),
                       x_true=x_true, preconditioner="jacobi", dtype=jnp.float64)
    rel_plain = out_plain["error_A_norm"] / out_plain["error_A_norm"][0]
    rel_prec = out_prec["error_A_norm"] / out_prec["error_A_norm"][0]
    it_plain = np.argmin(rel_plain > 1e-5)
    it_prec = np.argmin(rel_prec > 1e-5)
    assert it_prec > 0 and (it_plain == 0 or it_prec < it_plain)


def test_gv_w_replace_hook(spd64):
    a = spd64
    b = a @ np.ones(a.shape[0])
    calls = (lambda k, view: (k % 10) == 0)
    out = cgt.run("gv_cg", a, b, max_iter=80, w_replace=calls,
                  probes=("updated_residual_2_norm",), dtype=jnp.float64)
    assert out["updated_residual_2_norm"][-1] < 1e-6 * out["updated_residual_2_norm"][0]


def test_gv_w_replace_stateful_adaptive_policy(spd64):
    """Stateful hook protocol: the policy depends on its own replacement
    history (the reference's cross-iteration wk_replace_flags dict,
    gv_cg.py:40,69-72) — here a doubling-interval schedule: replace at
    k = 5, 15, 35, 75, ... (interval 10, 20, 40 after each firing)."""
    import jax.numpy as jnp_

    a = spd64
    b = a @ np.ones(a.shape[0])

    def policy(k, view, st):
        do = k >= st["next_k"]
        new_st = dict(
            next_k=jnp_.where(do, st["next_k"] + st["interval"], st["next_k"]),
            interval=jnp_.where(do, 2 * st["interval"], st["interval"]),
            count=st["count"] + do.astype(jnp_.int32),
        )
        return do, new_st

    init = dict(next_k=np.int32(5), interval=np.int32(10), count=np.int32(0))
    out = cgt.run("gv_cg", a, b, max_iter=80, w_replace=policy,
                  w_replace_init=init, probes=("updated_residual_2_norm",),
                  dtype=jnp.float64)
    assert out["updated_residual_2_norm"][-1] < 1e-4 * out["updated_residual_2_norm"][0]

    # drive the step functions directly to observe the carried state:
    # firings at k = 5, 15, 35 within 40 iterations -> count == 3
    from new_cg_variants_tpu.ops.operators import DenseOperator
    from new_cg_variants_tpu.solvers.api import _resolve
    from new_cg_variants_tpu.solvers.context import Context

    op = DenseOperator(jnp.asarray(a, dtype=jnp.float64))
    init_fn, step_fn, _ = _resolve("gv_cg", op, None, policy, init)
    ctx = Context(op, None)
    st = init_fn(ctx, jnp.asarray(b, dtype=jnp.float64),
                 jnp.zeros(a.shape[0], dtype=jnp.float64))
    for _ in range(40):
        st = step_fn(ctx, st)
    assert int(st["wrep"]["count"]) == 3
    assert int(st["wrep"]["next_k"]) == 75
    assert int(st["wrep"]["interval"]) == 80


@pytest.mark.parametrize("variant", ["hs_pcg", "pipe_pr_pcg"])
@pytest.mark.parametrize(
    "norm_type", ["natural", "unpreconditioned", "preconditioned"]
)
def test_solve_norm_semantics(variant, norm_type):
    """The reported solve norm equals the explicitly computed norm of the
    final recurrence residual in the requested flavor, with the norm's
    inner product riding the family's sync batch (no extra collective —
    pinned structurally in test_comm_structure)."""
    coo = cgt.load_matrix("bcsstk03")
    a = coo.toarray()
    n = a.shape[0]
    b = a @ (np.ones(n) / np.sqrt(n))
    d = np.diag(a)
    res = cgt.solve(a, b, variant=variant, rtol=1e-6, max_iter=3000,
                    preconditioner="jacobi", norm_type=norm_type,
                    dtype=jnp.float64)
    assert res.converged
    assert 50 < res.iterations < 3000  # really iterated, really exited
    r = b - a @ np.asarray(res.x)
    expect = {
        "natural": np.sqrt(abs(r @ (r / d))),
        "unpreconditioned": np.linalg.norm(r),
        "preconditioned": np.linalg.norm(r / d),
    }[norm_type]
    # recurrence vs true residual drift is tiny at these tolerances
    assert abs(res.norm - expect) / expect < 1e-2
