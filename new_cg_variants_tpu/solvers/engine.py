"""Engine cores shared by single-device and distributed execution.

:func:`history_scan` — fixed-length ``lax.scan`` capturing probe rows
(experiment semantics: row 0 = initial state, rows 1.. after each step).

:func:`tolerance_loop` — ``lax.while_loop`` with convergence test and
early exit (production semantics).

Both take an already-constructed context, so the same code drives a
:class:`~.context.Context` on one device or a mesh context inside
``shard_map`` (:mod:`new_cg_variants_tpu.parallel.contexts`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["history_scan", "tolerance_loop"]


def history_scan(ctx, init_fn, step_fn, probe_fns, b, x0, length, aux,
                 print_every=0):
    """Run ``length`` states (init + length-1 steps), stacking probe rows.

    ``print_every=K`` emits an in-loop progress line every K iterations
    (the reference's ``print_k`` callback, ``callbacks/print_k.py:28-29``)
    via ``jax.debug.print`` — no host sync, ordering best-effort.
    """
    state = init_fn(ctx, b, x0)

    def probe_row(s):
        return {name: fn(ctx, s, aux) for name, fn in probe_fns.items()}

    def body(s, _):
        s2 = step_fn(ctx, s)
        if print_every:
            from ..ops.doublefloat import collapse

            jax.lax.cond(
                s2["k"] % print_every == 0,
                lambda: jax.debug.print(
                    "iter {k}: sqrt(nu) = {n}", k=s2["k"],
                    n=jnp.sqrt(jnp.abs(collapse(s2["nu"]))),
                ),
                lambda: None,
            )
        return s2, probe_row(s2)

    row0 = probe_row(state)
    if length > 1:
        final, rows = jax.lax.scan(body, state, None, length=length - 1)
        hist = jax.tree.map(
            lambda a0, rest: jnp.concatenate([a0[None], rest]), row0, rows
        )
    else:
        final, hist = state, jax.tree.map(lambda a0: a0[None], row0)
    return final, hist


def tolerance_loop(ctx, init_fn, step_fn, b, x0, max_iter, rtol, atol, norm_type):
    """Iterate until the chosen norm falls below tol or max_iter hits.

    Norm plumbing keeps the families' one-sync-per-iteration invariant:
    for unpreconditioned runs all three norm types coincide with
    ``sqrt(nu)`` (there ``nu = r.r``), and for preconditioned runs the
    needed extra inner product rides the family's existing fused
    reduction batch via ``ctx.extra_norm`` (state key ``rho``) — PETSc
    likewise derives its norms from the same reduction
    (``cg_impls/pipeprcg.c:112-136``).  No per-iteration extra
    collective in any configuration.

    Returns ``(state, iterations, norm, tol)``.
    """
    if norm_type not in ("natural", "unpreconditioned", "preconditioned", "none"):
        raise ValueError(f"unknown norm_type {norm_type!r}")

    in_batch = (
        norm_type in ("unpreconditioned", "preconditioned") and ctx.has_prec
    )
    if in_batch:
        ctx.extra_norm = "r" if norm_type == "unpreconditioned" else "rt"

    from ..ops.doublefloat import collapse

    def iter_norm(s):
        if norm_type == "none":
            return jnp.zeros((), dtype=s["nu"].dtype)
        if in_batch:
            return jnp.sqrt(jnp.abs(collapse(s["rho"])))
        return jnp.sqrt(jnp.abs(collapse(s["nu"])))

    state = init_fn(ctx, b, x0)
    if in_batch:
        # initial rho: one extra dot OUTSIDE the loop (init only), so the
        # state structure matches what the step functions produce
        v = state["rt"] if ctx.extra_norm == "rt" and "rt" in state else state["r"]
        (rho0,) = ctx.dots((v, v))
        state["rho"] = rho0
    # the tolerance is measured in the SAME norm flavor as the iteration
    # norm (PETSc KSPConvergedDefault semantics): natural -> sqrt(b'M^-1 b),
    # preconditioned -> ||M^-1 b||, unpreconditioned -> ||b||
    if norm_type == "natural":
        (bb,) = ctx.dots((b, ctx.prec(b)))
    elif norm_type == "preconditioned":
        bt = ctx.prec(b)
        (bb,) = ctx.dots((bt, bt))
    else:
        (bb,) = ctx.dots((b, b))
    tol = jnp.maximum(
        rtol * jnp.sqrt(jnp.abs(collapse(bb))), atol
    ).astype(b.dtype)

    def cond(carry):
        s, k, nrm = carry
        if norm_type == "none":
            return k < max_iter
        return jnp.logical_and(k < max_iter, nrm > tol)

    def body(carry):
        s, k, _ = carry
        s2 = step_fn(ctx, s)
        return s2, k + 1, iter_norm(s2)

    s, k, nrm = jax.lax.while_loop(
        cond, body, (state, jnp.zeros((), jnp.int32), iter_norm(state))
    )
    return s, k, nrm, tol
