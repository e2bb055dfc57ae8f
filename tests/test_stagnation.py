"""Post-convergence stagnation: long fixed-iteration f32 solves stay finite.

The recurrence residual decays geometrically below the attainable floor,
so chaining one f32 solve far past convergence underflows nu (and the
sibling scalars) to exact zero; before round 4 the next beta = 0/0 went
NaN and poisoned the state (bench.py had to re-init per trial to dodge
it).  PETSc's convergence test breaks the loop instead
(``cg_impls/pipeprcg.c:112-136``); the fixed-iteration analog is the
``_safe_div`` freeze in :mod:`new_cg_variants_tpu.solvers.families`:
alpha = beta = 0 once the denominator underflows, so the iterate stops
moving while staying finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model
from new_cg_variants_tpu.solvers.context import Context
from new_cg_variants_tpu.solvers.families import FAMILIES, _safe_div


def test_safe_div_matches_plain_division():
    num = jnp.asarray([1.0, -3.0, 0.0, 2.5])
    den = jnp.asarray([2.0, 0.5, 4.0, -1.0])
    np.testing.assert_array_equal(
        np.asarray(_safe_div(num, den)), np.asarray(num / den)
    )


def test_safe_div_zero_denominator_freezes():
    assert float(_safe_div(jnp.float32(0.0), jnp.float32(0.0))) == 0.0
    assert float(_safe_div(jnp.float32(3.0), jnp.float32(0.0))) == 0.0


def _long_run(family, iters=6000, n=512):
    # well-conditioned problem: converges in tens of iterations, then the
    # f32 recurrence residual underflows within a few hundred more — the
    # remaining thousands of iterations exercise the frozen regime
    op64, b, x_true = banded_model(n, k=4, kappa=10.0, rho=0.5)
    op = op64.astype(jnp.float32)
    b = jnp.asarray(np.asarray(b), jnp.float32)
    init_fn, step_fn = FAMILIES[family]

    @jax.jit
    def go(op, b):
        ctx = Context(op, None)
        s = init_fn(ctx, b, jnp.zeros_like(b))
        return jax.lax.fori_loop(0, iters, lambda _, st: step_fn(ctx, st), s)

    s = go(op, b)
    return s, x_true


#: families whose f32 recurrence residual actually decays to underflow:
#: the classics and every RECOMPUTING variant.  gv and the
#: non-recomputing pipe-P twins instead stall at (or drift above) their
#: attainable floor — the paper's accuracy loss for plain pipelining —
#: so for them only finiteness is asserted.
_UNDERFLOWING = ("hs", "cgcg", "pr", "m", "pipe_pr", "pipe_pr_m")


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_long_fixed_iteration_run_stays_finite(family):
    s, x_true = _long_run(family)
    for key, leaf in s.items():
        assert np.isfinite(np.asarray(leaf)).all(), f"{key} not finite"
    if family not in _UNDERFLOWING:
        return
    # nu must have underflowed (the regime under test) and the iterate
    # must still BE the solution — frozen, not drifted
    assert float(s["nu"]) == 0.0
    x = np.asarray(s["x"], np.float64)
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-5, f"iterate drifted: rel fwd error {rel:.2e}"
