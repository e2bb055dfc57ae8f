"""Declarative per-iteration probes (observability layer).

The reference instruments its solvers by calling each callback as
``callback(**locals())`` from inside the Python loop
(``numerical_experiments/cg_variants/hs_cg.py:63-65``) — untraceable under
XLA.  The TPU-native replacement is a declarative probe set: each probe is
a pure function ``probe(ctx, state, aux) -> array`` evaluated inside the
``lax.scan`` body, its per-iteration values stacked into a preallocated
``(max_iter, ...)`` output — same data the reference callbacks produce
(``callbacks/*.py``), captured without leaving the compiled loop.

Probe name parity with ``numerical_experiments/callbacks/``:

===========================  ============================================
probe                        reference callback
===========================  ============================================
error_A_norm                 callbacks/error_A_norm.py
error_2_norm                 callbacks/error_2_norm.py
residual_2_norm              callbacks/residual_2_norm.py  (true residual)
updated_residual_2_norm      callbacks/updated_residual_2_norm.py
alpha / beta / nu / mu       (scalar series; implicit in callback locals)
save_x / save_r              callbacks/save_x.py, save_r.py
updated_error_A_norm         callbacks/updated_error_A_norm.py — post-hoc,
                             see :mod:`.posthoc` (needs A^{-1} solves)
lanczos_recurrence           callbacks/lanczos_recurrence.py — post-hoc
===========================  ============================================

``aux`` carries run-constant data (``b``, ``x_true``).  Expensive oracle
probes that need direct solves run post-hoc on host from saved histories
(:mod:`.posthoc`) instead of poking ``spsolve`` into the hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["PROBES", "resolve_probes", "DEFAULT_PROBES"]


def _plain(v):
    """Collapse a double-float value to working precision for recording.

    Probe ROWS are always single-word arrays regardless of the solve's
    arithmetic mode (`dtype="f32x2"` states carry (hi, lo) pairs; their
    probe values are f32-representable).
    """
    from ..ops.doublefloat import collapse

    return collapse(v)


def error_A_norm(ctx, state, aux):
    e = state["x"] - aux["x_true"]
    (eae,) = ctx.dots((e, ctx.mv(e)))
    return jnp.sqrt(jnp.abs(_plain(eae)))


def error_2_norm(ctx, state, aux):
    e = state["x"] - aux["x_true"]
    (ee,) = ctx.dots((e, e))
    # abs guard like error_A_norm: a compensated/double-word dot can
    # collapse to a tiny NEGATIVE value near the attainable floor, and
    # sqrt of it would turn the rest of the history into NaN
    return jnp.sqrt(jnp.abs(_plain(ee)))


def residual_2_norm(ctx, state, aux):
    r_true = aux["b"] - ctx.mv(state["x"])
    (rr,) = ctx.dots((r_true, r_true))
    return jnp.sqrt(jnp.abs(_plain(rr)))


def updated_residual_2_norm(ctx, state, aux):
    r = state["r"]
    (rr,) = ctx.dots((r, r))
    return jnp.sqrt(jnp.abs(_plain(rr)))


def _scalar(key):
    def probe(ctx, state, aux):
        return _plain(state[key])

    return probe


def save_x(ctx, state, aux):
    return _plain(state["x"])


def save_r(ctx, state, aux):
    return _plain(state["r"])


PROBES = {
    "error_A_norm": error_A_norm,
    "error_2_norm": error_2_norm,
    "residual_2_norm": residual_2_norm,
    "updated_residual_2_norm": updated_residual_2_norm,
    "alpha": _scalar("a"),
    "beta": _scalar("b"),
    "nu": _scalar("nu"),
    "mu": _scalar("mu"),
    "save_x": save_x,
    "save_r": save_r,
}

DEFAULT_PROBES = ("updated_residual_2_norm",)


def resolve_probes(probes):
    """Normalise a probe spec list into ``{name: fn}``.

    Entries may be names from :data:`PROBES` or ``(name, fn)`` pairs for
    custom probes.
    """
    out = {}
    for p in probes:
        if isinstance(p, str):
            out[p] = PROBES[p]
        elif isinstance(p, tuple) and len(p) == 2 and callable(p[1]):
            out[p[0]] = p[1]
        elif callable(p):
            out[getattr(p, "__name__", repr(p))] = p
        else:
            raise TypeError(f"bad probe spec {p!r}")
    return out
