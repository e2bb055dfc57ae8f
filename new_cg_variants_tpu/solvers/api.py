"""Solver API: history runs (experiments) and tolerance solves (production).

Two entry points over the family step functions:

* :func:`run` — fixed-iteration ``lax.scan`` capturing per-iteration probe
  histories; mirrors the reference experiment semantics where output index
  0 is the initial state and indices ``1..max_iter-1`` follow each loop
  iteration (``numerical_experiments/cg_variants/hs_cg.py:33-65``).
* :func:`solve` — ``lax.while_loop`` with convergence test and early exit;
  the production interface, analogous to PETSc ``KSPSolve`` with norm
  types natural / unpreconditioned / preconditioned / none
  (``cg_impls/pipeprcg.c:112-136``).

Thin wrappers named after the reference's 20 public variants
(``cg_variants/__init__.py:64-74``) are generated in
:mod:`new_cg_variants_tpu.solvers.variants`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.operators import as_operator
from ..probes.probes import resolve_probes
from .context import Context
from .engine import history_scan, tolerance_loop
from .families import FAMILIES, family_of, make_gv_step
from .precond import IdentityPreconditioner, make_preconditioner

__all__ = ["run", "solve", "SolveResult", "VARIANT_NAMES"]

VARIANT_NAMES = tuple(
    f"{base}_{suffix}"
    for base in ("hs", "cg", "gv", "pr", "m", "pipe_p", "pipe_pr", "pipe_p_m", "pipe_pr_m")
    for suffix in ("cg", "pcg")
)


def _gv_replace_hooks(key, init_fn, step_fn, w_replace, w_replace_init):
    """Wire the gv residual-replacement hook into (init_fn, step_fn).

    Shared by the plain and f32x2 resolution paths so the hook protocol
    (incl. the stateful ``wrep`` carry leaf — the reference's mutable
    ``wk_replace_flags`` dict, gv_cg.py:40) cannot diverge between
    arithmetic modes.
    """
    if key != "gv" or w_replace is None:
        return init_fn, step_fn
    stateful = w_replace_init is not None
    step_fn = make_gv_step(w_replace, stateful=stateful)
    if stateful:
        base_init = init_fn

        def init_fn(ctx, b, x0, _base=base_init):
            st = _base(ctx, b, x0)
            st["wrep"] = jax.tree.map(jnp.asarray, w_replace_init)
            return st

    return init_fn, step_fn


def _resolve(variant, op, preconditioner, w_replace=None, w_replace_init=None):
    key, prec_flag = family_of(variant)
    init_fn, step_fn = FAMILIES[key]
    init_fn, step_fn = _gv_replace_hooks(key, init_fn, step_fn, w_replace,
                                         w_replace_init)
    precond = make_preconditioner(
        preconditioner if prec_flag else None, op
    )
    if prec_flag and precond is None:
        # a *_pcg variant with no preconditioner given degrades to M = I,
        # like the reference's default `preconditioner=lambda x: x`
        precond = IdentityPreconditioner()
    return init_fn, step_fn, precond


def _needs_x_true(probe_fns):
    return any(name.startswith("error") for name in probe_fns)


def _vector_dtype(op):
    """Solve-vector dtype for an operator.

    bf16 is a STORAGE-ONLY tier: the matrix data streams HBM at half
    width (the dominant traffic term) while vectors, scalars and all
    arithmetic stay f32 — products against bf16 data promote to f32 in
    XLA and are converted at register level inside the Pallas kernels.
    A bf16 matrix is a fixed perturbation dA with ||dA||/||A|| ~ 2^-8,
    so the attainable error floors near kappa * 2^-8 — measured policy
    in benchmarks/bf16_study.json; use for mild-conditioning problems
    or loose tolerances only.
    """
    return jnp.float32 if op.dtype == jnp.bfloat16 else op.dtype


#: above this dimension the direct solve goes through scipy sparse LU —
#: densifying a 90k-row fixture (s3dkq4m2) would need ~65 GB
_SPARSE_SOLVE_MIN_N = 4096


def _compute_x_true(op, b):
    """Host-side direct solve for the error probes.

    The reference callbacks lazily compute ``x_true`` with a SPARSE
    direct solve when not supplied (``callbacks/error_A_norm.py:36-39``,
    ``sp.sparse.linalg.spsolve``); large operators take the same sparse
    path here, small ones a dense LAPACK solve.
    """
    b64 = np.asarray(b, dtype=np.float64)
    if op.n >= _SPARSE_SOLVE_MIN_N and hasattr(op, "tocsr"):
        import scipy.sparse.linalg as spla

        return spla.spsolve(op.tocsr().tocsc(), b64)
    a = np.asarray(op.todense(), dtype=np.float64)
    return np.linalg.solve(a, b64)


def run(
    variant,
    A,
    b,
    x0=None,
    max_iter=100,
    preconditioner=None,
    probes=("updated_residual_2_norm",),
    x_true=None,
    w_replace=None,
    w_replace_init=None,
    dtype=None,
    use_jit=True,
    compensated=False,
    print_every=0,
):
    """Run ``max_iter`` iterations of a variant, capturing probe histories.

    Returns a dict with ``'name'``, ``'max_iter'`` and one ``(max_iter,)``
    (or ``(max_iter, n)`` for vector probes) array per probe — the same
    output-dict shape the reference solvers return
    (``cg_variants/hs_cg.py:18-20``).

    ``w_replace_init`` switches the gv residual-replacement hook to the
    stateful protocol: ``w_replace(k, view, rep_state) -> (bool,
    new_rep_state)`` with ``rep_state`` initialized to this pytree.

    ``dtype="f32x2"`` runs the whole solve in double-word (two-float)
    arithmetic (:mod:`..ops.doublefloat`) — the TPU substitute for the
    reference's float64 recurrences, ~48 significant bits on f32
    hardware.  Probe histories come back single-word.
    """
    if dtype == "f32x2":
        return _run_df(variant, A, b, x0, max_iter, preconditioner, probes,
                       x_true, use_jit, print_every, w_replace,
                       w_replace_init)
    op = as_operator(A, dtype=dtype)
    vdt = _vector_dtype(op)
    b = jnp.asarray(b, dtype=vdt)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, dtype=vdt)
    if _needs_x_true(resolve_probes(probes)) and x_true is None:
        x_true = _compute_x_true(op, b)
    # auto-routed block-banded operators solve in the REORDERED basis:
    # permute b/x0/x_true once here instead of gathering every matvec
    # (iteration norms are permutation-invariant)
    from ..ops.block_banded import solver_basis

    op, _to_basis, _from_basis = solver_basis(op)
    b = _to_basis(b)
    x0 = _to_basis(x0)
    init_fn, step_fn, precond = _resolve(
        variant, op, preconditioner, w_replace, w_replace_init
    )
    probe_fns = resolve_probes(probes)

    aux = {"b": b}
    if _needs_x_true(probe_fns):
        aux["x_true"] = _to_basis(jnp.asarray(x_true, dtype=vdt))

    def go(op, precond, b, x0, aux):
        ctx = Context(op, precond, compensated=compensated)
        return history_scan(ctx, init_fn, step_fn, probe_fns, b, x0, max_iter,
                            aux, print_every=print_every)

    if use_jit:
        go = jax.jit(go)
    final, hist = go(op, precond, b, x0, aux)

    output = {"name": variant, "max_iter": max_iter,
              "x": _from_basis(final["x"])}
    for name in probe_fns:
        h = hist[name]
        if getattr(h, "ndim", 1) == 2 and h.shape[1] == op.n:
            h = jax.vmap(_from_basis)(h)  # vector probes back to original
        output[name] = np.asarray(h)
    return output


def _df_pieces(variant, A, b, x0, preconditioner, w_replace=None,
               w_replace_init=None):
    """Shared setup for the double-word solve mode: DF operator, DF
    rhs/initial guess, DF-aware preconditioner and context."""
    from ..ops.doublefloat import (
        DFJacobi,
        DoubleFloatContext,
        df_operator,
        df_split,
    )
    from .precond import FunctionPreconditioner

    op = df_operator(A)
    b_df = df_split(np.asarray(b, np.float64))
    x0_df = df_split(np.zeros(op.n) if x0 is None
                     else np.asarray(x0, np.float64))
    key, prec_flag = family_of(variant)
    init_fn, step_fn = FAMILIES[key]
    # the residual-replacement hook in double-word arithmetic: the view
    # dict carries DF values — policies that inspect magnitudes should
    # collapse via .value()
    init_fn, step_fn = _gv_replace_hooks(key, init_fn, step_fn, w_replace,
                                         w_replace_init)
    precond = None
    if prec_flag:
        if preconditioner in (None, "identity"):
            precond = IdentityPreconditioner()
        elif preconditioner == "jacobi" or isinstance(preconditioner, DFJacobi):
            precond = (preconditioner if isinstance(preconditioner, DFJacobi)
                       else DFJacobi.from_operator(op))
        elif hasattr(preconditioner, "apply"):
            # user object; its apply must map DF -> DF (e.g. a DFJacobi
            # built from a custom inverse diagonal via df_split)
            precond = preconditioner
        elif callable(preconditioner):
            # raw callable M^-1: v_df -> v_df, like the reference's
            # arbitrary-callable threading (cg_variants/__init__.py)
            precond = FunctionPreconditioner(preconditioner)
        else:
            raise NotImplementedError(
                "f32x2 preconditioner must be None|'jacobi', a DF-aware "
                "object with .apply, or a DF->DF callable; got "
                + repr(preconditioner)
            )
    ctx_cls = DoubleFloatContext
    return op, b_df, x0_df, init_fn, step_fn, precond, ctx_cls


def _df_jit(fn):
    """jit for double-word code: keep XLA from un-compensating the EFTs.

    XLA's fusion pass duplicates cheap multiplies into consumer fusions,
    where the backend contracts ``mul+add`` into fma — mathematically
    "more accurate" per op, but it breaks the error-free-transform
    invariant (``s = p + e`` becomes ``p + 2e`` when p is recomputed as
    ``fma(a, b, e)``), collapsing double-word arithmetic back to single
    precision (measured: -13.2 -> -7.8 log10 floor on bcsstk03).
    ``optimization_barrier`` does NOT help — the barrier expander runs
    before fusion.  Disabling the fusion pass for these (small,
    accuracy-mode) programs preserves the written rounding exactly; if
    a backend rejects the option, fall back to plain jit.
    """
    try:
        return jax.jit(fn, compiler_options={
            "xla_disable_hlo_passes": "fusion"})
    except Exception as e:
        import warnings

        warnings.warn(
            "f32x2 mode could not disable XLA's fusion pass "
            f"(compiler_options rejected: {e!r}); double-word arithmetic "
            "may silently collapse toward single precision on this "
            "backend — treat f32x2 accuracy results with suspicion.",
            RuntimeWarning,
            stacklevel=2,
        )
        return jax.jit(fn)


_DF_SELFCHECK_DONE = False


def _df_selfcheck():
    """One-shot runtime check that the EFT invariant survives compilation.

    ``_df_jit``'s fusion kill-switch can be silently ignored (an option
    typo, a backend that accepts-and-drops ``compiler_options``, a
    future XLA renaming the pass) — in all of which f32x2 degrades to
    single precision with no error.  This compiles one tiny program
    through the SAME jit path and checks the two error-free transforms
    the mode rests on return nonzero error words.  Runs once per
    process; ``NCGV_SKIP_DF_CHECK=1`` skips (e.g. to avoid one extra
    remote compile on a tunnel-attached chip).
    """
    global _DF_SELFCHECK_DONE
    import os

    if _DF_SELFCHECK_DONE or os.environ.get("NCGV_SKIP_DF_CHECK"):
        return
    _DF_SELFCHECK_DONE = True
    from ..ops.compensated import two_prod, two_sum

    def prog(a, small, b):
        s, err = two_sum(a, small)
        p, e = two_prod(b, b)
        return err * 2.0**30, e * 2.0**24  # scaled to O(1) if intact

    err, e = _df_jit(prog)(
        jnp.float32(1.0), jnp.float32(2.0**-30), jnp.float32(1 + 2.0**-12)
    )
    if float(err) == 0.0 or float(e) == 0.0:
        import warnings

        warnings.warn(
            "double-word EFT invariant did NOT survive compilation on "
            f"this backend (two_sum err={float(err)}, two_prod "
            f"e={float(e)}, expected 1.0 each): the f32x2 mode is "
            "silently collapsing toward single precision. See "
            "solvers/api.py:_df_jit.",
            RuntimeWarning,
            stacklevel=3,
        )


def _run_df(variant, A, b, x0, max_iter, preconditioner, probes, x_true,
            use_jit, print_every, w_replace=None, w_replace_init=None):
    """Fixed-iteration history run in double-word arithmetic."""
    from ..ops.doublefloat import df_split

    op, b_df, x0_df, init_fn, step_fn, precond, ctx_cls = _df_pieces(
        variant, A, b, x0, preconditioner, w_replace, w_replace_init
    )
    probe_fns = resolve_probes(probes)
    aux = {"b": b_df}
    if _needs_x_true(probe_fns):
        if x_true is None:
            x_true = _compute_x_true(op, np.asarray(b, np.float64))
        # x_true split into (hi, lo) so the error probes subtract in
        # double-word precision (a plain-f32 x_true would floor the
        # measured error at f32 rounding, hiding exactly the effect
        # this mode exists to remove)
        aux["x_true"] = df_split(np.asarray(x_true, np.float64))

    def go(op, precond, b, x0, aux):
        ctx = ctx_cls(op, precond)
        return history_scan(ctx, init_fn, step_fn, probe_fns, b, x0, max_iter,
                            aux, print_every=print_every)

    if use_jit:
        _df_selfcheck()
        go = _df_jit(go)
    final, hist = go(op, precond, b_df, x0_df, aux)

    output = {"name": variant, "max_iter": max_iter,
              "x": final["x"].value64()}
    for name in probe_fns:
        output[name] = np.asarray(hist[name])
    return output


@dataclass
class SolveResult:
    x: jnp.ndarray
    iterations: int
    norm: float
    converged: bool


def solve(
    A,
    b,
    variant="pipe_pr_cg",
    x0=None,
    rtol=1e-8,
    atol=0.0,
    max_iter=10_000,
    preconditioner=None,
    norm_type="natural",
    dtype=None,
    use_jit=True,
    compensated=False,
):
    """Tolerance-driven solve with early exit (production path).

    ``norm_type``:

    * ``'natural'`` — sqrt(nu) from the iteration scalars, free of extra
      communication (PETSc ``KSP_NORM_NATURAL``).
    * ``'unpreconditioned'`` — true recurrence-residual 2-norm ||r||; adds
      one dot per iteration.
    * ``'none'`` — fixed ``max_iter`` iterations, no convergence test
      (the scaling-experiment configuration, ``-ksp_norm_type none``).

    ``dtype="f32x2"`` solves in double-word arithmetic (see :func:`run`).
    """
    if dtype == "f32x2":
        op, b_df, x0_df, init_fn, step_fn, precond, ctx_cls = _df_pieces(
            variant, A, b, x0, preconditioner
        )

        def go_df(op, precond, b, x0):
            ctx = ctx_cls(op, precond)
            s, k, nrm, tol = tolerance_loop(
                ctx, init_fn, step_fn, b, x0, max_iter, rtol, atol, norm_type
            )
            return s["x"], k, nrm, tol

        if use_jit:
            _df_selfcheck()
            go_df = _df_jit(go_df)
        x_df, k, nrm, tol = go_df(op, precond, b_df, x0_df)
        return SolveResult(
            x=x_df.value64(), iterations=int(k), norm=float(nrm),
            converged=bool(norm_type == "none" or float(nrm) <= float(tol)),
        )
    op = as_operator(A, dtype=dtype)
    vdt = _vector_dtype(op)
    b = jnp.asarray(b, dtype=vdt)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, dtype=vdt)
    # auto-routed block-banded operators: solve in the reordered basis
    # (see run()); two O(n) permutations per solve, none per iteration
    from ..ops.block_banded import solver_basis

    op, _to_basis, _from_basis = solver_basis(op)
    b = _to_basis(b)
    x0 = _to_basis(x0)
    init_fn, step_fn, precond = _resolve(variant, op, preconditioner)

    def go(op, precond, b, x0):
        ctx = Context(op, precond, compensated=compensated)
        s, k, nrm, tol = tolerance_loop(
            ctx, init_fn, step_fn, b, x0, max_iter, rtol, atol, norm_type
        )
        return s["x"], k, nrm, tol

    if use_jit:
        go = jax.jit(go)
    x, k, nrm, tol = go(op, precond, b, x0)
    return SolveResult(
        x=_from_basis(x),
        iterations=int(k),
        norm=float(nrm),
        converged=bool(norm_type == "none" or float(nrm) <= float(tol)),
    )
