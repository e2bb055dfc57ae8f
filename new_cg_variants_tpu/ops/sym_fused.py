"""Whole-iteration fused kernels on SYMMETRIC half-band storage.

Round-4 measurements (PERF.md) left the framework's best matrix-stored
formulation — the mirror-spill half-band SpMV (:mod:`.sym_dia`), 1.87x
the full-DIA wall for hs_cg — an island: the whole-iteration fusions
(:mod:`.fused_step`, :mod:`.fused_family`) were full-DIA only, so the
pipelined families gained just 1.16x from half storage.  These kernels
run each family's elementwise updates, the HALF-BAND SpMV of the
updated vector(s) and the iteration's local dot partials in ONE pass
over HBM — the PETSc always-best-formulation hot loop
(``cg_impls/pipeprcg.c:145-173``) on the storage CG's SPD contract
makes legal.

Mechanics merge the two proven kernels:

* From :mod:`.fused_family`: the SpMV input is computed in-kernel from
  the family's elementwise update; its FRONT halo (the next tile's
  first ``h`` rows, needed by the upper-diagonal reads) is precomputed
  by XLA on per-tile boundary slivers and laid into (8x128)-aligned
  1024-element pieces, so the in-kernel window concat and every
  diagonal's shifted read stay at Mosaic-legal static offsets.
* From :mod:`.sym_dia`: the mirror term — ``u_d = data[d] * v`` shifted
  RIGHT by ``off_d`` — is decomposed in the native (sublane, lane)
  layout (lane rotate + one sublane carry + iota-mask select, valid for
  half-bands < 128), with the tile-crossing rows carried across the
  SEQUENTIAL grid in a VMEM spill scratch.  The half-band is read
  exactly once per mv input set (the 2-RHS pipe step shares one read).

Update order inside each kernel is the family's generic order exactly
(finite-precision parity, tests/test_sym_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_family import (
    _cgcg_finish,
    _cgcg_prec_finish,
    _cgcg_prec_update,
    _cgcg_update,
    _gv_finish,
    _gv_prec_finish,
    _gv_prec_update,
    _gv_update,
    _hs_finish,
    _hs_update,
    _pr_finish,
    _pr_prec_finish,
    _pr_prec_update,
    _pr_update,
)
from .fused_step import DEFAULT_TILE, _boundary_rows, _piece

__all__ = [
    "supports_sym_full",
    "fused_sym_pr_full_step",
    "fused_sym_cgcg_matvec_phase",
    "fused_sym_gv_matvec_phase",
    "fused_sym_hs_matvec_phase",
    "fused_sym_pr_full_step_prec",
    "fused_sym_cgcg_matvec_phase_prec",
    "fused_sym_gv_matvec_phase_prec",
    "fused_sym_pipe_full_step",
    "fused_sym_pipe_full_step_prec",
]


def supports_sym_full(offsets, n: int, tile: int = DEFAULT_TILE) -> bool:
    """Half-band inside the mirror decomposition's domain + exact tiling."""
    h = max(int(o) for o in offsets)
    return (
        1 <= h < 128
        and tile % 128 == 0
        and n % tile == 0
        and n // tile >= 2
        and 2 * h <= tile
    )


def _lift(update):
    """Adapt a single-mv family spec to the tuple-of-mv-inputs protocol."""

    def lifted(sc, *vecs):
        outs, mv_in = update(sc, *vecs)
        return outs, (mv_in,)

    return lifted


def _lift_finish(finish):
    def lifted(sc, outs, accs, vecs):
        return finish(sc, outs, accs[0], vecs)

    return lifted


# ---------------------------------------------------------------------------
# Pipe-family specs (2 mv inputs when recomputing).  Update order matches
# families.make_pipe_step / fused_step._full_kernel exactly.
# ---------------------------------------------------------------------------


def _pipe_update(sc, x, r, w, u, p, s):
    a1, beta = sc[0], sc[1]
    r2 = r - a1 * s
    w2 = w - a1 * u
    s2 = w2 + beta * s
    p2 = r2 + beta * p
    x2 = x + a1 * p
    return (x2, r2, p2, s2), (s2, r2)  # u = A s2, w = A r2 (recompute)


def _pipe_finish(sc, outs, accs, vecs):
    _, r2, p2, s2 = outs
    # mu = p.s, delta = r.s, gamma = s.s, nu = r.r
    return (), (p2 * s2, r2 * s2, s2 * s2, r2 * r2)


def _pipe_update_norec(sc, x, r, w, u, p, s):
    a1, beta = sc[0], sc[1]
    r2 = r - a1 * s
    w2 = w - a1 * u
    s2 = w2 + beta * s
    p2 = r2 + beta * p
    x2 = x + a1 * p
    return (x2, r2, w2, p2, s2), (s2,)


def _pipe_finish_norec(sc, outs, accs, vecs):
    _, r2, _, p2, s2 = outs
    return (), (p2 * s2, r2 * s2, s2 * s2, r2 * r2)


def _pipe_prec_update(sc, d, x, r, w, u, p, s, rt, st, wt, ut):
    a1, beta = sc[0], sc[1]
    r2 = r - a1 * s
    w2 = w - a1 * u
    rt2 = rt - a1 * st
    wt2 = wt - a1 * ut
    p2 = rt2 + beta * p
    s2 = w2 + beta * s
    st2 = wt2 + beta * st
    x2 = x + a1 * p
    return (x2, r2, p2, s2, rt2, st2), (st2, rt2)


def _pipe_prec_finish(sc, outs, accs, vecs):
    d = vecs[0]
    _, r2, p2, s2, rt2, st2 = outs
    u2, w3 = accs
    # PCApply of both matvec results, still in-kernel
    return (d * u2, d * w3), (p2 * s2, r2 * st2, st2 * s2, rt2 * r2)


def _pipe_prec_update_norec(sc, d, x, r, w, u, p, s, rt, st, wt, ut):
    a1, beta = sc[0], sc[1]
    r2 = r - a1 * s
    w2 = w - a1 * u
    rt2 = rt - a1 * st
    wt2 = wt - a1 * ut
    p2 = rt2 + beta * p
    s2 = w2 + beta * s
    st2 = wt2 + beta * st
    x2 = x + a1 * p
    return (x2, r2, w2, wt2, p2, s2, rt2, st2), (st2,)


def _pipe_prec_finish_norec(sc, outs, accs, vecs):
    d = vecs[0]
    _, r2, _, _, p2, s2, rt2, st2 = outs
    (u2,) = accs
    return (d * u2,), (p2 * s2, r2 * st2, st2 * s2, rt2 * r2)


# ---------------------------------------------------------------------------
# Generic kernel + wrapper
# ---------------------------------------------------------------------------


def _sym_family_kernel(update, finish, nvec, n_mv, nout, offsets, tile,
                       piece, data_ref, *refs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vec_refs = refs[:nvec]
    hi_refs = refs[nvec : nvec + n_mv]
    ab_ref = refs[nvec + n_mv]
    out_refs = refs[nvec + n_mv + 1 : nvec + n_mv + 2 + nout]
    spill_refs = refs[nvec + n_mv + 2 + nout :]
    dots_o = out_refs[-1]

    step = pl.program_id(0)
    rows = tile // 128
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)

    sc = tuple(ab_ref[i] for i in range(2))
    vecs = tuple(v[:] for v in vec_refs)
    outs, mv_ins = update(sc, *vecs)

    from .fused_step import _data_rows

    dat = _data_rows(data_ref, vec_refs[0].dtype)

    def sym_spmv(mv_in, hi_ref, spill_ref):
        """Half-band SpMV of the in-kernel-updated vector.

        Forward (upper+main) reads ride the [center | front-halo]
        window.  The mirror — ``u_d = data[d] * v`` shifted RIGHT by
        ``off_d`` — is decomposed per diagonal into a lane rotate plus a
        lane-index select into two planes: A (cells that stay in their
        sublane row) and B (cells that wrap to the next row).  The
        sublane carry is LINEAR and off-independent, so B is rolled
        ONCE after the loop instead of per diagonal (~35% fewer mirror
        VPU ops than the per-diagonal roll+mask formulation); row 0 of
        the rolled B is exactly the next tile's spill, carried across
        the sequential grid in ``spill_ref``.
        """
        win = jnp.concatenate([mv_in, hi_ref[:]])
        acc = dat(0) * mv_in
        for d in range(1, len(offsets)):
            o = offsets[d]
            acc = acc + dat(d) * win[o : o + tile]
        acc = acc + jnp.where(step > 0, spill_ref[:], 0.0)
        tot = jnp.zeros((rows, 128), acc.dtype)
        pb = jnp.zeros((rows, 128), acc.dtype)
        for d in range(1, len(offsets)):
            off = offsets[d]
            u2 = (dat(d) * mv_in).reshape(rows, 128)
            rl = pltpu.roll(u2, off, 1)
            tot = tot + rl
            pb = pb + jnp.where(lane2 < off, rl, 0.0)
        # in-row plane = total - wrapped plane (one subtract per pass
        # instead of a second select+add per diagonal)
        pa = tot - pb
        br = pltpu.roll(pb, 1, 0)
        carried = jnp.where(row2 == 0, 0.0, br)
        acc = acc + (pa + carried).reshape(tile)
        spill_ref[:] = jnp.where(row2 == 0, br, 0.0).reshape(tile)
        return acc

    accs = tuple(
        sym_spmv(mv, hi, sp)
        for mv, hi, sp in zip(mv_ins, hi_refs, spill_refs)
    )
    extra, prods = finish(sc, outs, accs, vecs)
    for o_ref, val in zip(out_refs[:-1],
                          tuple(outs) + accs + tuple(extra)):
        o_ref[:] = val

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    zero = jnp.zeros_like(accs[0], shape=(128,))
    dots_o[0] = jnp.stack(
        [lanes(p) for p in prods] + [zero] * (8 - len(prods))
    )


def _run_sym_family(update, finish, offsets, data, vecs, scalars, nout,
                    ndots, n_mv, tile, interpret, extra_flops):
    """Shared wrapper: front-halo slivers -> pallas_call -> (outs, dots).

    Vector-output order is ``update outs + matvec results + finish
    extras``.  The grid is SEQUENTIAL (the mirror spill carries across
    steps), matching :mod:`.sym_dia`.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = vecs[0].shape[0]
    ndiags = data.shape[0]
    assert n % tile == 0 and data.shape[1] == n
    nt = n // tile
    h = max(int(o) for o in offsets)
    assert 1 <= h < 128
    piece = _piece(h)
    nvec = len(vecs)
    dtype = vecs[0].dtype

    sc_pad = list(scalars) + [jnp.zeros((), dtype)] * (2 - len(scalars))
    ab = jnp.stack(sc_pad).astype(dtype)

    # front halo of each mv input: the update applied to (nt, h) NEXT-tile
    # head slivers — elementwise updates make the recompute exact
    highs = tuple(_boundary_rows(v, h, nt, tile)[1] for v in vecs)
    _, mv_his = update(scalars, *highs)
    hi_flats = tuple(
        jnp.zeros((nt, piece), dtype).at[:, :h].set(mh).reshape(-1)
        for mh in mv_his
    )

    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((piece,), lambda i: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_sym_family_kernel, update, finish, nvec, n_mv,
                          nout, tuple(offsets), tile, piece),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ]
        + [vec_spec] * nvec
        + [halo_spec] * n_mv
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * nout
        + [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n,), dtype)] * nout
        + [jax.ShapeDtypeStruct((nt, 8, 128), dtype)],
        scratch_shapes=[pltpu.VMEM((tile,), dtype) for _ in range(n_mv)],
        cost_estimate=pl.CostEstimate(
            flops=(4 * ndiags * n_mv + extra_flops) * n,
            bytes_accessed=(ndiags + nvec + nout + n_mv) * n * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the mirror spill carries across steps
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,)
        ),
        interpret=interpret,
    )(data, *vecs, *hi_flats, ab)
    vec_outs = outs[:nout]
    dots = jnp.sum(outs[-1], axis=(0, 2))
    return vec_outs, tuple(dots[i] for i in range(ndots))


# ---------------------------------------------------------------------------
# Public kernels: half-band twins of ops/fused_family.py + the pipe
# whole-iteration fusion of ops/fused_step.py
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_pr_full_step(offsets, data, x, r, p, s, a1, beta, *,
                           tile=DEFAULT_TILE, interpret=None):
    """One fused unpreconditioned PR/Meurant-CG iteration, half-band A."""
    (x2, r2, p2, s2), dots = _run_sym_family(
        _lift(_pr_update), _lift_finish(_pr_finish), offsets, data,
        (x, r, p, s), (a1, beta), nout=4, ndots=4, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=14,
    )
    return x2, r2, p2, s2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_cgcg_matvec_phase(offsets, data, x, r, p, s, a1, *,
                                tile=DEFAULT_TILE, interpret=None):
    """Fused Chronopoulos-Gear matvec phase, half-band A."""
    (x2, r2, w2), dots = _run_sym_family(
        _lift(_cgcg_update), _lift_finish(_cgcg_finish), offsets, data,
        (x, r, p, s), (a1,), nout=3, ndots=2, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=8,
    )
    return x2, r2, w2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_gv_matvec_phase(offsets, data, x, r, w, u, p, s, a1, *,
                              tile=DEFAULT_TILE, interpret=None):
    """Fused Ghysels-Vanroose matvec phase, half-band A."""
    (x2, r2, w2, t), dots = _run_sym_family(
        _lift(_gv_update), _lift_finish(_gv_finish), offsets, data,
        (x, r, w, u, p, s), (a1,), nout=4, ndots=2, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=10,
    )
    return x2, r2, w2, t, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_hs_matvec_phase(offsets, data, r, p, beta, *,
                              tile=DEFAULT_TILE, interpret=None):
    """Fused Hestenes-Stiefel second sync phase, half-band A."""
    (p2, s2), dots = _run_sym_family(
        _lift(_hs_update), _lift_finish(_hs_finish), offsets, data,
        (r, p), (beta,), nout=2, ndots=1, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=4,
    )
    return p2, s2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_pr_full_step_prec(offsets, data, inv_diag, x, r, p, s, rt, st,
                                a1, beta, *, tile=DEFAULT_TILE,
                                interpret=None):
    """One fused Jacobi-preconditioned PR/Meurant-CG iteration, half-band."""
    (x2, r2, rt2, p2, s2, st2), dots = _run_sym_family(
        _lift(_pr_prec_update), _lift_finish(_pr_prec_finish), offsets, data,
        (inv_diag, x, r, p, s, rt, st), (a1, beta), nout=6, ndots=4, n_mv=1,
        tile=tile, interpret=interpret, extra_flops=20,
    )
    return x2, r2, rt2, p2, s2, st2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_cgcg_matvec_phase_prec(offsets, data, inv_diag, x, r, p, s,
                                     a1, *, tile=DEFAULT_TILE,
                                     interpret=None):
    """Fused Jacobi-prec CG matvec phase, half-band A."""
    (x2, r2, rt2, w2), dots = _run_sym_family(
        _lift(_cgcg_prec_update), _lift_finish(_cgcg_prec_finish), offsets,
        data, (inv_diag, x, r, p, s), (a1,), nout=4, ndots=2, n_mv=1,
        tile=tile, interpret=interpret, extra_flops=12,
    )
    return x2, r2, rt2, w2, dots


@functools.partial(jax.jit, static_argnames=("offsets", "tile", "interpret"))
def fused_sym_gv_matvec_phase_prec(offsets, data, inv_diag, x, r, w, u, p, s,
                                   rt, st, a1, *, tile=DEFAULT_TILE,
                                   interpret=None):
    """Fused Jacobi-prec GV matvec phase, half-band A."""
    (x2, r2, rt2, w2, wt2, t), dots = _run_sym_family(
        _lift(_gv_prec_update), _lift_finish(_gv_prec_finish), offsets, data,
        (inv_diag, x, r, w, u, p, s, rt, st), (a1,), nout=6, ndots=2,
        n_mv=1, tile=tile, interpret=interpret, extra_flops=16,
    )
    return x2, r2, rt2, w2, wt2, t, dots


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "recompute")
)
def fused_sym_pipe_full_step(offsets, data, x, r, w, u, p, s, a1, beta, *,
                             recompute=True, tile=DEFAULT_TILE,
                             interpret=None):
    """One fused unpreconditioned pipe-P/PR iteration body, half-band A.

    Return signature matches :func:`..ops.fused_step.fused_pipe_full_step`:
    ``(x2, r2, w_out, p2, s2, u2, (mu, delta, gamma, nu))``.  With
    ``recompute`` the fused 2-RHS half-band pass streams the band ONCE
    for both ``u = A s2`` and ``w = A r2``.
    """
    if recompute:
        (x2, r2, p2, s2, u2, w_out), dots = _run_sym_family(
            _pipe_update, _pipe_finish, offsets, data, (x, r, w, u, p, s),
            (a1, beta), nout=6, ndots=4, n_mv=2, tile=tile,
            interpret=interpret, extra_flops=18,
        )
        return x2, r2, w_out, p2, s2, u2, dots
    (x2, r2, w2, p2, s2, u2), dots = _run_sym_family(
        _pipe_update_norec, _pipe_finish_norec, offsets, data,
        (x, r, w, u, p, s), (a1, beta), nout=6, ndots=4, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=18,
    )
    return x2, r2, w2, p2, s2, u2, dots


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "recompute")
)
def fused_sym_pipe_full_step_prec(offsets, data, inv_diag, x, r, w, u, p, s,
                                  rt, st, wt, ut, a1, beta, *,
                                  recompute=True, tile=DEFAULT_TILE,
                                  interpret=None):
    """One fused Jacobi-preconditioned pipe-P/PR iteration, half-band A.

    Return signature matches
    :func:`..ops.fused_step.fused_pipe_full_step_prec`: ``(x2, r2, w_out,
    p2, s2, u2, rt2, st2, wt_out, ut2, (mu, delta, gamma, nu))``.
    """
    vecs = (inv_diag, x, r, w, u, p, s, rt, st, wt, ut)
    if recompute:
        (x2, r2, p2, s2, rt2, st2, u2, w3, ut2, wt3), dots = _run_sym_family(
            _pipe_prec_update, _pipe_prec_finish, offsets, data, vecs,
            (a1, beta), nout=10, ndots=4, n_mv=2, tile=tile,
            interpret=interpret, extra_flops=32,
        )
        return x2, r2, w3, p2, s2, u2, rt2, st2, wt3, ut2, dots
    (x2, r2, w2, wt2, p2, s2, rt2, st2, u2, ut2), dots = _run_sym_family(
        _pipe_prec_update_norec, _pipe_prec_finish_norec, offsets, data,
        vecs, (a1, beta), nout=10, ndots=4, n_mv=1, tile=tile,
        interpret=interpret, extra_flops=32,
    )
    return x2, r2, w2, p2, s2, u2, rt2, st2, wt2, ut2, dots
