"""Whole-iteration fused kernels for the 1-matvec CG families.

The reference's PETSc hot loops fuse the ENTIRE iteration for every KSP,
not just the pipelined one: stock CG (``cg_impls/cg.c`` hot loop), PRCG
(``cg_impls/prcg.c:122-137``) each run their AXPY block, matvec and dot
reductions as one tight region.  In the split execution here (Pallas
SpMV kernel + XLA vector phase) the matrix pass and the vector phase are
separate trips over HBM, which put the 1-matvec variants at ~50-55% of
the measured bandwidth ceiling (PERF.md).  These kernels run the
family's elementwise updates, the band SpMV of the *updated* vector and
the iteration's local dot partials in ONE pass over HBM.

Mechanics are exactly the proven :mod:`.fused_step` full-step layout:
the SpMV input's halo rows are precomputed by XLA on per-tile boundary
slivers (the updates are elementwise, so recomputing 2h rows per tile is
valid and negligible) and laid into 1024-element (8x128)-tile-aligned
back/front pieces, so the in-kernel window concat and every diagonal's
shifted read stay at Mosaic-legal static offsets.

Family fusion points (all unpreconditioned; the scalar work between
kernels stays in XLA/SMEM — it is O(1)):

=========  ==============================================================
family     fused region (one kernel call per iteration unless noted)
=========  ==============================================================
pr / m     x,r updates + p update (beta is PREDICTED, so known at entry)
           + ``s = A p`` + all 4 dot partials  — the whole iteration
cgcg       x,r updates + ``w = A r`` + nu,eta partials; the p,s AXPYs
           (need beta = nu/nu1) stay in XLA
gv         x,r,w updates + ``t = A w`` + nu,eta partials; p,s,u AXPYs
           stay in XLA
hs         second sync phase only: ``p = r + beta p``, ``s = A p``, mu
           partial (the first phase — x,r updates + the nu reduction —
           is one XLA fusion already; HS's two DEPENDENT syncs are the
           algorithm, cf. hs_cg.py)
=========  ==============================================================

Update order inside each kernel is the family's generic order exactly
(finite-precision parity, tests/test_fused_family.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_step import (
    DEFAULT_TILE,
    _boundary_rows,
    _halo_pieces,
    _piece,
    supports_full_step,
)

__all__ = [
    "fused_pr_full_step",
    "fused_cgcg_matvec_phase",
    "fused_gv_matvec_phase",
    "fused_hs_matvec_phase",
    "fused_pr_full_step_prec",
    "fused_cgcg_matvec_phase_prec",
    "fused_gv_matvec_phase_prec",
    "supports_full_step",
]


# ---------------------------------------------------------------------------
# Family specs: elementwise update program + dot-product list.
#
# ``update(sc, *vecs) -> (outs, mv_in)`` must be PURELY ELEMENTWISE — it
# is applied both to full center tiles inside the kernel and to (nt, h)
# boundary slivers by the wrapper to build the halo pieces.  ``dots``
# receives the update outputs plus the SpMV result and returns the
# products whose lane-sums form the iteration's local partials.
# ---------------------------------------------------------------------------


def _pr_update(sc, x, r, p, s):
    a1, beta = sc[0], sc[1]
    x2 = x + a1 * p
    r2 = r - a1 * s
    p2 = r2 + beta * p
    return (x2, r2, p2), p2


def _pr_finish(sc, outs, s2, vecs):
    _, r2, p2 = outs
    # mu = p.s, delta = r.s, gamma = s.s, nu = r.r  (families.make_pr_step)
    return (), (p2 * s2, r2 * s2, s2 * s2, r2 * r2)


def _cgcg_update(sc, x, r, p, s):
    a1 = sc[0]
    x2 = x + a1 * p
    r2 = r - a1 * s
    return (x2, r2), r2


def _cgcg_finish(sc, outs, w2, vecs):
    _, r2 = outs
    # nu = r.r, eta = w.r  (families.cgcg_step)
    return (), (r2 * r2, w2 * r2)


def _gv_update(sc, x, r, w, u, p, s):
    a1 = sc[0]
    x2 = x + a1 * p
    r2 = r - a1 * s
    w2 = w - a1 * u
    return (x2, r2, w2), w2


def _gv_finish(sc, outs, _t, vecs):
    _, r2, w2 = outs
    return (), (r2 * r2, w2 * r2)


def _hs_update(sc, r, p):
    beta = sc[0]
    p2 = r + beta * p
    return (p2,), p2


def _hs_finish(sc, outs, s2, vecs):
    (p2,) = outs
    return (), (p2 * s2,)


# --- Jacobi-preconditioned twins: the inverse diagonal rides as the
# --- first "vector" input (elementwise, so slivers work unchanged);
# --- PCApply of the SpMV result happens in finish, still in-kernel —
# --- the PETSc MatMult+PCApply hot region as literally one pass
# --- (cg_impls/prcg.c:122-137 with PCJACOBI).


def _pr_prec_update(sc, d, x, r, p, s, rt, st):
    a1, beta = sc[0], sc[1]
    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = rt - a1 * st
    p2 = rt2 + beta * p
    return (x2, r2, rt2, p2), p2


def _pr_prec_finish(sc, outs, s2, vecs):
    d = vecs[0]
    _, r2, rt2, p2 = outs
    st2 = d * s2
    # mu = p.s, delta = r.st, gamma = st.s, nu = rt.r
    return (st2,), (p2 * s2, r2 * st2, st2 * s2, rt2 * r2)


def _cgcg_prec_update(sc, d, x, r, p, s):
    a1 = sc[0]
    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = d * r2
    return (x2, r2, rt2), rt2


def _cgcg_prec_finish(sc, outs, w2, vecs):
    _, r2, rt2 = outs
    # nu = r.rt, eta = w.rt
    return (), (r2 * rt2, w2 * rt2)


def _gv_prec_update(sc, d, x, r, w, u, p, s, rt, st):
    a1 = sc[0]
    x2 = x + a1 * p
    r2 = r - a1 * s
    rt2 = rt - a1 * st
    w2 = w - a1 * u
    wt2 = d * w2
    return (x2, r2, rt2, w2, wt2), wt2


def _gv_prec_finish(sc, outs, _t, vecs):
    _, r2, rt2, w2, _wt2 = outs
    return (), (r2 * rt2, w2 * rt2)


# ---------------------------------------------------------------------------
# Generic kernel + wrapper over a family spec
# ---------------------------------------------------------------------------


def _family_kernel(update, finish, nvec, offsets, tile, piece,
                   data_ref, *refs):
    vec_refs = refs[:nvec]
    lo_ref, hi_ref, ab_ref = refs[nvec], refs[nvec + 1], refs[nvec + 2]
    out_refs = refs[nvec + 3:]
    dots_o = out_refs[-1]

    sc = tuple(ab_ref[i] for i in range(2))
    vecs = tuple(v[:] for v in vec_refs)
    outs, mv_in = update(sc, *vecs)

    from .fused_step import _data_rows

    dat = _data_rows(data_ref, mv_in.dtype)
    win = jnp.concatenate([lo_ref[:], mv_in, hi_ref[:]])
    o0 = offsets[0]
    acc = dat(0) * win[piece + o0 : piece + o0 + tile]
    for d in range(1, len(offsets)):
        o = offsets[d]
        acc = acc + dat(d) * win[piece + o : piece + o + tile]

    # post-matvec elementwise outputs (e.g. Jacobi PCApply of the SpMV
    # result) + the iteration's dot products — all still in-kernel
    extra, prods = finish(sc, outs, acc, vecs)
    for o_ref, val in zip(out_refs[:-1], tuple(outs) + (acc,) + tuple(extra)):
        o_ref[:] = val

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    zero = jnp.zeros_like(acc, shape=(128,))
    dots_o[0] = jnp.stack(
        [lanes(p) for p in prods] + [zero] * (8 - len(prods))
    )


def _run_family(update, finish, offsets, data, vecs, scalars, nout,
                ndots, tile, interpret, extra_flops):
    """Shared wrapper: halo slivers -> pallas_call -> (outs, dots).

    ``vecs`` may include elementwise coefficient arrays (e.g. the Jacobi
    inverse diagonal) — ``update`` is applied to boundary slivers of ALL
    of them, so any input the matvec operand's update reads must be in
    the list.  ``nout`` counts ALL vector outputs: update outs + the
    matvec result + finish extras, in that order.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = vecs[0].shape[0]
    ndiags = data.shape[0]
    assert n % tile == 0 and data.shape[1] == n
    nt = n // tile
    h = max(abs(int(o)) for o in offsets)
    piece = _piece(h)
    nvec = len(vecs)
    dtype = vecs[0].dtype

    # scalars ride SMEM as a fixed 2-slot buffer (unused slot zero)
    sc_pad = list(scalars) + [jnp.zeros((), dtype)] * (2 - len(scalars))
    ab = jnp.stack(sc_pad).astype(dtype)

    # the SpMV input's updated boundary rows, recomputed by XLA on
    # (nt, h) slivers — elementwise updates make this exact
    lows, highs = zip(*(_boundary_rows(v, h, nt, tile) for v in vecs))
    _, mv_lo = update(scalars, *lows)
    _, mv_hi = update(scalars, *highs)
    lo, hi = _halo_pieces(mv_lo, mv_hi, h, nt, dtype, piece)

    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((piece,), lambda i: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_family_kernel, update, finish, nvec,
                          tuple(offsets), tile, piece),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ]
        + [vec_spec] * nvec
        + [halo_spec] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * nout
        + [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n,), dtype)] * nout
        + [jax.ShapeDtypeStruct((nt, 8, 128), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=(2 * ndiags + extra_flops) * n,
            bytes_accessed=(ndiags + 2 * nvec + 1) * n * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
        ),
        interpret=interpret,
    )(data, *vecs, lo, hi, ab)
    vec_outs = outs[:nout]
    dots = jnp.sum(outs[-1], axis=(0, 2))
    return vec_outs, tuple(dots[i] for i in range(ndots))


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_pr_full_step(offsets, data, x, r, p, s, a1, beta, *,
                       tile=DEFAULT_TILE, interpret=None):
    """One fused unpreconditioned PR/Meurant-CG iteration body.

    beta comes PREDICTED from the previous iteration's scalars
    (``families._predict_nu``), so the whole iteration fuses: returns
    ``(x2, r2, p2, s2, (mu, delta, gamma, nu))`` with ``s2 = A p2`` and
    nu the RECOMPUTED ``r2.r2`` — the reference update order
    (``numerical_experiments/cg_variants/pr_cg.py:61-72``).
    """
    (x2, r2, p2, s2), dots = _run_family(
        _pr_update, _pr_finish, offsets, data, (x, r, p, s), (a1, beta),
        nout=4, ndots=4, tile=tile, interpret=interpret, extra_flops=14,
    )
    return x2, r2, p2, s2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_cgcg_matvec_phase(offsets, data, x, r, p, s, a1, *,
                            tile=DEFAULT_TILE, interpret=None):
    """Fused Chronopoulos-Gear matvec phase.

    ``(x2, r2, w2, (nu, eta))`` with ``w2 = A r2`` — the x,r updates,
    the matvec of the UPDATED residual and the single fused sync's
    partials in one pass (``cg_variants/cg_cg.py:46-69``); the p,s AXPYs
    need beta = nu/nu1 and stay outside.
    """
    (x2, r2, w2), dots = _run_family(
        _cgcg_update, _cgcg_finish, offsets, data, (x, r, p, s), (a1,),
        nout=3, ndots=2, tile=tile, interpret=interpret, extra_flops=8,
    )
    return x2, r2, w2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_gv_matvec_phase(offsets, data, x, r, w, u, p, s, a1, *,
                          tile=DEFAULT_TILE, interpret=None):
    """Fused Ghysels-Vanroose matvec phase.

    ``(x2, r2, w2, t, (nu, eta))`` with ``t = A w2`` — x,r,w updates,
    the pipelined matvec and the single sync's partials in one pass
    (``cg_variants/gv_cg.py:51-75``); p,s,u AXPYs stay outside (beta).
    """
    (x2, r2, w2, t), dots = _run_family(
        _gv_update, _gv_finish, offsets, data, (x, r, w, u, p, s), (a1,),
        nout=4, ndots=2, tile=tile, interpret=interpret, extra_flops=10,
    )
    return x2, r2, w2, t, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_hs_matvec_phase(offsets, data, r, p, beta, *,
                          tile=DEFAULT_TILE, interpret=None):
    """Fused Hestenes-Stiefel second sync phase.

    ``(p2, s2, (mu,))`` with ``p2 = r + beta p``, ``s2 = A p2`` — the
    direction update, matvec and mu partial of HS's second sync in one
    pass (``cg_variants/hs_cg.py:36-60``).
    """
    (p2, s2), dots = _run_family(
        _hs_update, _hs_finish, offsets, data, (r, p), (beta,),
        nout=2, ndots=1, tile=tile, interpret=interpret, extra_flops=4,
    )
    return p2, s2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_pr_full_step_prec(offsets, data, inv_diag, x, r, p, s, rt, st,
                            a1, beta, *, tile=DEFAULT_TILE, interpret=None):
    """One fused Jacobi-preconditioned PR/Meurant-CG iteration body.

    ``(x2, r2, rt2, p2, s2, st2, (mu, delta, gamma, nu))`` with
    ``s2 = A p2`` and ``st2 = M^-1 s2`` computed IN the same pass — the
    MatMult+PCApply region of the PETSc KSPPRCG hot loop
    (``cg_impls/prcg.c:122-137``) as one kernel.
    """
    (x2, r2, rt2, p2, s2, st2), dots = _run_family(
        _pr_prec_update, _pr_prec_finish, offsets, data,
        (inv_diag, x, r, p, s, rt, st), (a1, beta),
        nout=6, ndots=4, tile=tile, interpret=interpret, extra_flops=20,
    )
    return x2, r2, rt2, p2, s2, st2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_cgcg_matvec_phase_prec(offsets, data, inv_diag, x, r, p, s, a1,
                                 *, tile=DEFAULT_TILE, interpret=None):
    """Fused Jacobi-preconditioned Chronopoulos-Gear matvec phase.

    ``(x2, r2, rt2, w2, (nu, eta))`` with ``rt2 = M^-1 r2`` and
    ``w2 = A rt2`` (``cg_variants/cg_cg.py:77-146`` preconditioned
    body); the p,s AXPYs (need beta) stay outside.
    """
    (x2, r2, rt2, w2), dots = _run_family(
        _cgcg_prec_update, _cgcg_prec_finish, offsets, data,
        (inv_diag, x, r, p, s), (a1,),
        nout=4, ndots=2, tile=tile, interpret=interpret, extra_flops=12,
    )
    return x2, r2, rt2, w2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_gv_matvec_phase_prec(offsets, data, inv_diag, x, r, w, u, p, s,
                               rt, st, a1, *, tile=DEFAULT_TILE,
                               interpret=None):
    """Fused Jacobi-preconditioned GV matvec phase.

    ``(x2, r2, rt2, w2, wt2, t, (nu, eta))`` with ``wt2 = M^-1 w2`` and
    ``t = A wt2`` (``cg_variants/gv_cg.py:89-176`` preconditioned body);
    p,s,u,st AXPYs stay outside.
    """
    (x2, r2, rt2, w2, wt2, t), dots = _run_family(
        _gv_prec_update, _gv_prec_finish, offsets, data,
        (inv_diag, x, r, w, u, p, s, rt, st), (a1,),
        nout=6, ndots=2, tile=tile, interpret=interpret, extra_flops=16,
    )
    return x2, r2, rt2, w2, wt2, t, dots
