"""Fused vector-phase Pallas kernel for the pipelined PR families.

One pipe-PR iteration (unpreconditioned) splits into

1. the VECTOR PHASE: 5 AXPY-class updates (x, r, w, p, s) plus the 4
   local dot partials (mu, delta, gamma, nu) of the single sync phase —
   the ``8x VecAXPY`` + ``VecMDot`` block of the PETSc implementation
   (``cg_impls/pipeprcg.c:145-158``);
2. the MATVEC PHASE: the fused 2-RHS SpMV (:mod:`.spmv_pallas`).

XLA fuses the elementwise updates well but materializes intermediates
between fusion islands and re-reads inputs for each reduce.  This kernel
makes the vector phase ONE pass: read x, r, w, u, p, s (+2 scalars),
write the 5 updated vectors and per-tile dot partials (summed by XLA
afterwards — a (tiles, 4) reduction, microseconds).

Scalar order in/out matches :func:`fused_pipe_vector_phase`'s docstring;
the caller (``families.make_pipe_step`` via the context) computes
alpha/beta on scalars as usual — only the O(n) work moves in here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "fused_pipe_vector_phase",
    "fused_pipe_vector_phase_prec",
    "supports_fused",
    "fused_pipe_full_step",
    "fused_pipe_full_step_prec",
    "supports_full_step",
]

# Measured on the v5e headline (k=32, pipe_pr full step, benchmarks/
# tile_scan.json): 2048 = 0.3284, 4096 = 0.2674, 8192 = 0.2450,
# 16384 = 0.2471 ms/iter — larger tiles sustain more HBM bandwidth
# (pallas_ceiling.json) and amortize the fixed 1024-element halo pieces.
DEFAULT_TILE = 4096

#: preference order for :func:`pick_tile` (best-measured first).
#: Measured on the PARALLEL-grid full-DIA full step and the 2-RHS
#: half-band pipe step (benchmarks/tile_scan.json): 8192 wins both.
_TILE_CHOICES = (8192, 4096, 2048, 1024)

#: the SEQUENTIAL-grid 1-matvec half-band kernels are HBM-bound and
#: amortize better at 16384 (hs_cg 0.1086 vs 0.1153 ms/iter at the
#: headline size — tile_scan.json "symdia" rows)
SYM_1MV_TILE_CHOICES = (16384,) + _TILE_CHOICES


def pick_tile(n: int, default: int = DEFAULT_TILE, choices=_TILE_CHOICES) -> int:
    """Largest well-measured tile that divides ``n`` with >= 2 tiles.

    The full-step kernels need ``n % tile == 0`` (no pad copy on the hot
    path), so the best tile is size-dependent; fall back to ``default``
    (the caller's supports check will then reject ragged n).
    """
    for t in choices:
        if n % t == 0 and n // t >= 2:
            return t
    return default


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_fused(n: int, tile: int = DEFAULT_TILE) -> bool:
    return n >= 1  # any size (padding handles raggedness)


def _kernel(tile, x_ref, r_ref, w_ref, u_ref, p_ref, s_ref, ab_ref,
            x_o, r_o, w_o, p_o, s_o, dots_o):
    import jax.experimental.pallas as pl

    a1 = ab_ref[0]
    beta = ab_ref[1]
    x = x_ref[:] + a1 * p_ref[:]
    r = r_ref[:] - a1 * s_ref[:]
    w = w_ref[:] - a1 * u_ref[:]
    p = r + beta * p_ref[:]  # rt = r (unpreconditioned)
    s = w + beta * s_ref[:]
    x_o[:] = x
    r_o[:] = r
    w_o[:] = w
    p_o[:] = p
    s_o[:] = s
    # Local dot partials of the single sync phase, accumulated across the
    # (sequential) TPU grid into one full-array VMEM (4, 128) output —
    # per-tile blocked outputs of shape (1, 4) violate the Mosaic (8, 128)
    # tiling rule, and scalar SMEM accumulation serializes the pipeline;
    # a revisited lane-wise vector accumulator does neither.  Final
    # cross-lane reduction happens outside the kernel (4x128, trivial).
    # mu = p.s, delta = r.st (= r.s), gamma = st.s (= s.s), nu = rt.r (= r.r)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dots_o[...] = jnp.zeros_like(dots_o)

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    dots_o[...] += jnp.stack(
        [lanes(p * s), lanes(r * s), lanes(s * s), lanes(r * r)]
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_pipe_vector_phase(x, r, w, u, p, s, a1, beta, *,
                            tile=DEFAULT_TILE, interpret=None):
    """Unpreconditioned pipe-P/PR vector phase, one pass.

    Returns ``(x2, r2, w2, p2, s2, (mu, delta, gamma, nu))`` where the
    dot values are LOCAL (un-psummed) partials over these arrays —
    identical semantics to forming them with ``jnp.vdot`` on the updated
    vectors.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = x.shape[0]
    n_pad = _round_up(n, tile)
    pad = n_pad - n

    def pad1(v):
        return jnp.pad(v, (0, pad)) if pad else v

    ab = jnp.stack([a1, beta]).astype(x.dtype)
    grid = (n_pad // tile,)
    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, tile),
        grid=grid,
        in_specs=[vec_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad,), x.dtype)] * 5
        + [jax.ShapeDtypeStruct((4, 128), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=18 * n_pad,
            bytes_accessed=11 * n_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pad1(x), pad1(r), pad1(w), pad1(u), pad1(p), pad1(s), ab)
    x2, r2, w2, p2, s2, lanes = outs
    dots = jnp.sum(lanes, axis=1)
    if pad:
        x2, r2, w2, p2, s2 = (v[:n] for v in (x2, r2, w2, p2, s2))
    return x2, r2, w2, p2, s2, (dots[0], dots[1], dots[2], dots[3])


def _prec_kernel(tile, x_ref, r_ref, w_ref, u_ref, p_ref, s_ref, rt_ref,
                 st_ref, wt_ref, ut_ref, ab_ref,
                 x_o, r_o, w_o, rt_o, wt_o, p_o, s_o, st_o, dots_o):
    """Preconditioned pipe vector phase: 8 updates + 4 local dot partials.

    The tilde (preconditioned) vectors are carried explicitly so the
    update ORDER is identical to the generic formulation in
    ``families.make_pipe_step`` (finite-precision parity) — the PCApply
    itself stays outside (it applies to the matvec OUTPUTS u, w).
    """
    import jax.experimental.pallas as pl

    a1 = ab_ref[0]
    beta = ab_ref[1]
    x = x_ref[:] + a1 * p_ref[:]
    r = r_ref[:] - a1 * s_ref[:]
    w = w_ref[:] - a1 * u_ref[:]
    rt = rt_ref[:] - a1 * st_ref[:]
    wt = wt_ref[:] - a1 * ut_ref[:]
    p = rt + beta * p_ref[:]
    s = w + beta * s_ref[:]
    st = wt + beta * st_ref[:]
    x_o[:] = x
    r_o[:] = r
    w_o[:] = w
    rt_o[:] = rt
    wt_o[:] = wt
    p_o[:] = p
    s_o[:] = s
    st_o[:] = st

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dots_o[...] = jnp.zeros_like(dots_o)

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    # mu = p.s, delta = r.st, gamma = st.s, nu = rt.r
    dots_o[...] += jnp.stack(
        [lanes(p * s), lanes(r * st), lanes(st * s), lanes(rt * r)]
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_pipe_vector_phase_prec(x, r, w, u, p, s, rt, st, wt, ut, a1, beta,
                                 *, tile=DEFAULT_TILE, interpret=None):
    """Preconditioned pipe-P/PR vector phase, one pass over HBM.

    Returns ``(x2, r2, w2, rt2, wt2, p2, s2, st2, (mu, delta, gamma,
    nu))`` with the dot values LOCAL partials (un-psummed), mirroring
    the generic formulation's semantics.  The PETSc analog is the 8x
    ``VecAXPY`` block + ``VecDot/VecMDot`` partials of the KSPPIPEPRCG
    hot loop with preconditioning (``cg_impls/pipeprcg.c:145-158``).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = x.shape[0]
    n_pad = _round_up(n, tile)
    pad = n_pad - n

    def pad1(v):
        return jnp.pad(v, (0, pad)) if pad else v

    ab = jnp.stack([a1, beta]).astype(x.dtype)
    grid = (n_pad // tile,)
    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_prec_kernel, tile),
        grid=grid,
        in_specs=[vec_spec] * 10
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 8
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad,), x.dtype)] * 8
        + [jax.ShapeDtypeStruct((4, 128), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=28 * n_pad,
            bytes_accessed=18 * n_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pad1(x), pad1(r), pad1(w), pad1(u), pad1(p), pad1(s), pad1(rt),
      pad1(st), pad1(wt), pad1(ut), ab)
    x2, r2, w2, rt2, wt2, p2, s2, st2, lanes = outs
    dots = jnp.sum(lanes, axis=1)
    if pad:
        x2, r2, w2, rt2, wt2, p2, s2, st2 = (
            v[:n] for v in (x2, r2, w2, rt2, wt2, p2, s2, st2)
        )
    return x2, r2, w2, rt2, wt2, p2, s2, st2, (
        dots[0], dots[1], dots[2], dots[3]
    )


# ---------------------------------------------------------------------------
# Whole-iteration fusion: vector phase + fused 2-RHS DIA SpMV in ONE kernel
# ---------------------------------------------------------------------------
#
# The split execution (XLA-fused vector phase, then the spmv_pallas 2-RHS
# kernel) re-reads the updated r and s from HBM, pads them into the halo
# layout (a write+read of 2 vectors per iteration) and fetches each padded
# vector twice (adjacent-block windows).  This kernel runs the ENTIRE
# unpreconditioned pipe-P/PR iteration body in one pass over HBM:
#
#   read  data (ndiags rows), x, r, w, u, p, s       (ndiags + 6 streams)
#   write x', r', p', s', u' = A s', w' = A r'       (6 streams)
#
# The SpMV of the *updated* r', s' needs h = max|offset| rows from the
# neighboring tiles.  Those updates are elementwise, so the wrapper
# precomputes them on just the 2h boundary rows of each tile (an XLA
# sliver computation, ~nt*2h elements) and lays them into per-tile
# 1024-element halo pieces:
#
#   lo[i*1024 + 1024-h : (i+1)*1024] = v'[iT-h : iT]      (back halo)
#   hi[i*1024 : i*1024 + h]          = v'[iT+T : iT+T+h]  (front halo)
#
# so the kernel window is  concat([lo_i (1024) | center (tile) | hi_i
# (1024)])  with every piece offset a multiple of the 8x128 vreg — Mosaic
# rejects concatenation at sub-tile offsets ("input offsets outside of
# the first tile") — and every diagonal's shifted read is the static
# value slice  window[1024+off : 1024+off+tile], exactly the proven
# mechanics of the spmv_pallas kernels.
#
# Mirrors the single overlapped communication phase of the PETSc
# KSPPIPEPRCG hot loop (cg_impls/pipeprcg.c:145-173): the 8-AXPY block,
# the VecDot/VecMDot partials and both MatMults are one fused region.

HALO_PIECE = 1024  # max supported band half-width


def _data_rows(data_ref, vdtype):
    """Per-row accessor; converts bf16 storage blocks to the compute
    dtype ONCE (per-row extracts from packed bf16 sublane tiles force a
    relayout per read — measured 4x slower, see ops/sym_dia.py)."""
    if data_ref.dtype != vdtype:
        _data = data_ref[...].astype(vdtype)

        def dat(d):
            return _data[d, :]
    else:
        def dat(d):
            return data_ref[d, :]
    return dat


def _piece(h: int) -> int:
    """Halo-piece width: the band rounded up to the FULL (8, 128) vreg tile.

    Mosaic requires every input of an in-kernel ``concatenate`` to start
    at a multiple of the 1024-element (8x128) tile — 128-lane alignment
    is NOT sufficient on all toolchains ("Input offsets outside of the
    first tile" on the driver's libtpu for a 128|2048|128 concat).  The
    sub-tile sizing saved only 0.03% of traffic at the headline k=32;
    portability wins.
    """
    return max(HALO_PIECE, -(-h // HALO_PIECE) * HALO_PIECE)


def supports_full_step(offsets, n: int, tile: int = DEFAULT_TILE) -> bool:
    """Full-step fusion needs the band inside the halo piece."""
    h = max(abs(int(o)) for o in offsets)
    return h <= HALO_PIECE and n % tile == 0 and n // tile >= 2


def _full_kernel(offsets, tile, piece, recompute, data_ref, x_ref, r_ref,
                 w_ref, u_ref, p_ref, s_ref, lo_r_ref, hi_r_ref, lo_s_ref,
                 hi_s_ref, ab_ref, x_o, r_o, p_o, s_o, u_o, w_o, dots_o):
    import jax.experimental.pallas as pl

    a1 = ab_ref[0]
    beta = ab_ref[1]
    # center-tile vector phase (update order = families.make_pipe_step)
    r2 = r_ref[:] - a1 * s_ref[:]
    w2 = w_ref[:] - a1 * u_ref[:]
    s2 = w2 + beta * s_ref[:]
    p2 = r2 + beta * p_ref[:]
    x_o[:] = x_ref[:] + a1 * p_ref[:]
    r_o[:] = r2
    p_o[:] = p2
    s_o[:] = s2

    dat = _data_rows(data_ref, r2.dtype)

    def spmv(win):
        o0 = offsets[0]
        acc = dat(0) * win[piece + o0 : piece + o0 + tile]
        for d in range(1, len(offsets)):
            o = offsets[d]
            acc = acc + dat(d) * win[piece + o : piece + o + tile]
        return acc

    u_o[:] = spmv(jnp.concatenate([lo_s_ref[:], s2, hi_s_ref[:]]))
    if recompute:
        w_o[:] = spmv(jnp.concatenate([lo_r_ref[:], r2, hi_r_ref[:]]))
    else:
        w_o[:] = w2

    # local 4-dot partials of the single sync phase.  Each grid step
    # writes its OWN (8, 128) block (rows 0-3 = partials, 4-7 zero) so
    # there is no cross-step accumulator dependency and the grid stays
    # embarrassingly parallel; XLA reduces the (nt, 8, 128) afterwards
    # (~1 MB, microseconds).
    del pl  # grid-independent kernel body
    zero = jnp.zeros_like(r2, shape=(128,))

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    dots_o[0] = jnp.stack(
        [lanes(p2 * s2), lanes(r2 * s2), lanes(s2 * s2), lanes(r2 * r2),
         zero, zero, zero, zero]
    )


def _boundary_rows(v, h, nt, tile):
    """Per-tile boundary slivers of ``v``: rows [iT-h,iT) and [iT+T,iT+T+h)."""
    v_r = v.reshape(nt, tile)
    z = jnp.zeros((1, h), v.dtype)
    low = jnp.concatenate([z, v_r[:-1, tile - h:]], axis=0)
    high = jnp.concatenate([v_r[1:, :h], z], axis=0)
    return low, high


def _halo_pieces(lows, highs, h, nt, dtype, piece):
    """(nt*piece,) aligned back/front halo pieces (see layout above)."""
    lo = jnp.zeros((nt, piece), dtype).at[:, piece - h:].set(lows)
    hi = jnp.zeros((nt, piece), dtype).at[:, :h].set(highs)
    return lo.reshape(-1), hi.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "recompute")
)
def fused_pipe_full_step(offsets, data, x, r, w, u, p, s, a1, beta, *,
                         recompute=True, tile=DEFAULT_TILE, interpret=None):
    """One fused unpreconditioned pipe-P/PR iteration body.

    Returns ``(x2, r2, w_out, p2, s2, u2, (mu, delta, gamma, nu))`` with
    ``u2 = A s2`` and ``w_out = A r2`` if ``recompute`` else the
    recurrence value ``w - a1*u`` — the semantics of
    ``pipe_vector_phase`` followed by ``mv2``/``mv``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = x.shape[0]
    ndiags = data.shape[0]
    assert n % tile == 0 and data.shape[1] == n
    nt = n // tile
    h = max(abs(int(o)) for o in offsets)
    assert h <= HALO_PIECE
    piece = _piece(h)

    ab = jnp.stack([a1, beta]).astype(x.dtype)
    # the updated r/s on each tile's 2h boundary rows, computed by XLA on
    # slivers (duplicates a negligible fraction of the kernel's update)
    r_lo, r_hi = _boundary_rows(r, h, nt, tile)
    s_lo, s_hi = _boundary_rows(s, h, nt, tile)
    w_lo, w_hi = _boundary_rows(w, h, nt, tile)
    u_lo, u_hi = _boundary_rows(u, h, nt, tile)
    r2_lo, r2_hi = (r_lo - a1 * s_lo, r_hi - a1 * s_hi)
    s2_lo, s2_hi = ((w_lo - a1 * u_lo) + beta * s_lo,
                    (w_hi - a1 * u_hi) + beta * s_hi)
    lo_r, hi_r = _halo_pieces(r2_lo, r2_hi, h, nt, x.dtype, piece)
    lo_s, hi_s = _halo_pieces(s2_lo, s2_hi, h, nt, x.dtype, piece)

    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(
        (piece,), lambda i: (i,), memory_space=pltpu.VMEM
    )
    itemsize = data.dtype.itemsize
    nrhs = 2 if recompute else 1
    outs = pl.pallas_call(
        functools.partial(_full_kernel, tuple(offsets), tile, piece,
                          recompute),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ]
        + [vec_spec] * 6
        + [halo_spec] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 6
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((n,), x.dtype)] * 6
        + [jax.ShapeDtypeStruct((nt, 8, 128), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=(2 * ndiags * nrhs + 18) * n,
            bytes_accessed=(ndiags + 13) * n * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
        ),
        interpret=interpret,
    )(data, x, r, w, u, p, s, lo_r, hi_r, lo_s, hi_s, ab)
    x2, r2, p2, s2, u2, w_out, lanes_acc = outs
    dots = jnp.sum(lanes_acc, axis=(0, 2))
    return x2, r2, w_out, p2, s2, u2, (dots[0], dots[1], dots[2], dots[3])


# ---------------------------------------------------------------------------
# Preconditioned (Jacobi) whole-iteration fusion.  PCApply is elementwise
# (x -> x / diag(A), figure_gen.py:42-44), so it fuses into the same pass:
# the PETSc hot region overlaps MatMult + PCApply inside the reduction
# bracket (cg_impls/pipeprcg.c:162-170); here they are literally one
# kernel.  The tilde (preconditioned) vectors are carried explicitly so
# the update order matches the generic formulation exactly.
# ---------------------------------------------------------------------------


def _full_kernel_prec(offsets, tile, piece, recompute, data_ref, d_ref,
                      x_ref, r_ref, w_ref, u_ref, p_ref, s_ref, rt_ref,
                      st_ref, wt_ref, ut_ref, lo_rt_ref, hi_rt_ref,
                      lo_st_ref, hi_st_ref, ab_ref, x_o, r_o, p_o, s_o,
                      rt_o, st_o, u_o, ut_o, w_o, wt_o, dots_o):
    a1 = ab_ref[0]
    beta = ab_ref[1]
    r2 = r_ref[:] - a1 * s_ref[:]
    w2 = w_ref[:] - a1 * u_ref[:]
    rt2 = rt_ref[:] - a1 * st_ref[:]
    wt2 = wt_ref[:] - a1 * ut_ref[:]
    p2 = rt2 + beta * p_ref[:]
    s2 = w2 + beta * s_ref[:]
    st2 = wt2 + beta * st_ref[:]
    x_o[:] = x_ref[:] + a1 * p_ref[:]
    r_o[:] = r2
    p_o[:] = p2
    s_o[:] = s2
    rt_o[:] = rt2
    st_o[:] = st2

    dat = _data_rows(data_ref, r2.dtype)

    def spmv(win):
        o0 = offsets[0]
        acc = dat(0) * win[piece + o0 : piece + o0 + tile]
        for d in range(1, len(offsets)):
            o = offsets[d]
            acc = acc + dat(d) * win[piece + o : piece + o + tile]
        return acc

    u2 = spmv(jnp.concatenate([lo_st_ref[:], st2, hi_st_ref[:]]))
    u_o[:] = u2
    ut_o[:] = d_ref[:] * u2
    if recompute:
        w3 = spmv(jnp.concatenate([lo_rt_ref[:], rt2, hi_rt_ref[:]]))
        w_o[:] = w3
        wt_o[:] = d_ref[:] * w3
    else:
        w_o[:] = w2
        wt_o[:] = wt2

    zero = jnp.zeros_like(r2, shape=(128,))

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    # mu = p.s, delta = r.st, gamma = st.s, nu = rt.r
    dots_o[0] = jnp.stack(
        [lanes(p2 * s2), lanes(r2 * st2), lanes(st2 * s2), lanes(rt2 * r2),
         zero, zero, zero, zero]
    )


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "recompute")
)
def fused_pipe_full_step_prec(offsets, data, inv_diag, x, r, w, u, p, s,
                              rt, st, wt, ut, a1, beta, *, recompute=True,
                              tile=DEFAULT_TILE, interpret=None):
    """One fused Jacobi-preconditioned pipe-P/PR iteration body.

    Returns ``(x2, r2, w_out, p2, s2, u2, rt2, st2, wt_out, ut2,
    (mu, delta, gamma, nu))`` matching the generic preconditioned branch
    of ``families.make_pipe_step``: ``u2 = A st2``, ``ut2 = M^-1 u2``,
    and ``w_out = A rt2`` / ``wt_out = M^-1 w_out`` when ``recompute``
    else the recurrence values.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = x.shape[0]
    ndiags = data.shape[0]
    assert n % tile == 0 and data.shape[1] == n
    nt = n // tile
    h = max(abs(int(o)) for o in offsets)
    assert h <= HALO_PIECE
    piece = _piece(h)

    ab = jnp.stack([a1, beta]).astype(x.dtype)
    # boundary slivers of the UPDATED matvec inputs rt2, st2
    rt_lo, rt_hi = _boundary_rows(rt, h, nt, tile)
    st_lo, st_hi = _boundary_rows(st, h, nt, tile)
    wt_lo, wt_hi = _boundary_rows(wt, h, nt, tile)
    ut_lo, ut_hi = _boundary_rows(ut, h, nt, tile)
    rt2_lo, rt2_hi = (rt_lo - a1 * st_lo, rt_hi - a1 * st_hi)
    st2_lo, st2_hi = ((wt_lo - a1 * ut_lo) + beta * st_lo,
                      (wt_hi - a1 * ut_hi) + beta * st_hi)
    lo_rt, hi_rt = _halo_pieces(rt2_lo, rt2_hi, h, nt, x.dtype, piece)
    lo_st, hi_st = _halo_pieces(st2_lo, st2_hi, h, nt, x.dtype, piece)

    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(
        (piece,), lambda i: (i,), memory_space=pltpu.VMEM
    )
    itemsize = data.dtype.itemsize
    nrhs = 2 if recompute else 1
    outs = pl.pallas_call(
        functools.partial(_full_kernel_prec, tuple(offsets), tile, piece,
                          recompute),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ]
        + [vec_spec] * 11
        + [halo_spec] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 10
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((n,), x.dtype)] * 10
        + [jax.ShapeDtypeStruct((nt, 8, 128), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=(2 * ndiags * nrhs + 30) * n,
            bytes_accessed=(ndiags + 22) * n * itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
        ),
        interpret=interpret,
    )(data, inv_diag, x, r, w, u, p, s, rt, st, wt, ut,
      lo_rt, hi_rt, lo_st, hi_st, ab)
    x2, r2, p2, s2, rt2, st2, u2, ut2, w_out, wt_out, lanes_acc = outs
    dots = jnp.sum(lanes_acc, axis=(0, 2))
    return x2, r2, w_out, p2, s2, u2, rt2, st2, wt_out, ut2, (
        dots[0], dots[1], dots[2], dots[3]
    )
