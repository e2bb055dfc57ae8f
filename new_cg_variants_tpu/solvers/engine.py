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
            jax.lax.cond(
                s2["k"] % print_every == 0,
                lambda: jax.debug.print(
                    "iter {k}: sqrt(nu) = {n}", k=s2["k"],
                    n=jnp.sqrt(jnp.abs(s2["nu"])),
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

    Returns ``(state, iterations, norm, tol)``.
    """

    def iter_norm(s):
        if norm_type == "natural":
            return jnp.sqrt(jnp.abs(s["nu"]))
        if norm_type == "unpreconditioned":
            (rr,) = ctx.dots((s["r"], s["r"]))
            return jnp.sqrt(rr)
        if norm_type == "preconditioned":
            # ||M^{-1} r||_2 (PETSc KSP_NORM_PRECONDITIONED); rt is carried
            # only by preconditioned runs, identical to r otherwise
            rt = s.get("rt", s["r"])
            (rr,) = ctx.dots((rt, rt))
            return jnp.sqrt(rr)
        if norm_type == "none":
            return jnp.zeros((), dtype=s["nu"].dtype)
        raise ValueError(f"unknown norm_type {norm_type!r}")

    state = init_fn(ctx, b, x0)
    (bb,) = ctx.dots((b, b))
    tol = jnp.maximum(rtol * jnp.sqrt(bb), atol).astype(b.dtype)

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
