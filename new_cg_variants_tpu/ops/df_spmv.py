"""Pallas TPU kernel for the double-word (f32x2) DIA SpMV.

The f32x2 mode must run under a jit with XLA's fusion pass disabled
(:func:`..solvers.api._df_jit`) — fusion re-contracts the error-free
transforms and collapses double-word arithmetic to single precision.
The price is that every elementwise intermediate of the DF SpMV (the
dominant O(ndiags * n) work) materializes in HBM: ~30 unfused ops per
diagonal per rhs, the measured 2.2x cost on bandwidth-class problems
(``benchmarks/f32x2_cost.json``).

This kernel runs the SAME EFT accumulation as
:meth:`~.doublefloat.DFOperator._mv_dia` — identical operation order,
identical rounding — in ONE pass: the three word arrays stream
HBM -> VMEM once, all intermediates live in vector registers, and
Mosaic compiles the arithmetic as written (the kernel body never goes
through the HLO fusion pass at all, so the EFT invariant holds by
construction; validated on the real toolchain in
``benchmarks/df_kernel_check.json``).

Window mechanics are exactly :mod:`.spmv_pallas` (padded vector passed
twice with adjacent block maps; every shifted read a static slice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .compensated import df_add, fast_two_sum, two_prod
from .spmv_pallas import DEFAULT_TILE, _round_up

__all__ = ["df_dia_spmv", "df_dia_spmv2", "supports_df",
           "df_dense_spmv", "df_dense_spmv2", "supports_df_dense"]


def supports_df(offsets, tile: int = DEFAULT_TILE) -> bool:
    h = max(abs(int(o)) for o in offsets)
    return 2 * h <= tile


def _df_dia_kernel(offsets, tile, h, nrhs, *refs):
    """One row tile of the double-word DIA SpMV.

    refs: hi/lo/lo2 data blocks, then per rhs 4 vector blocks (vh twice,
    vl twice — adjacent block maps), then per rhs (out_hi, out_lo).
    """
    hi_ref, lo_ref, lo2_ref = refs[0], refs[1], refs[2]
    v_refs = refs[3 : 3 + 4 * nrhs]
    out_refs = refs[3 + 4 * nrhs :]
    for r in range(nrhs):
        win_h = jnp.concatenate([v_refs[4 * r][:], v_refs[4 * r + 1][:]])
        win_l = jnp.concatenate([v_refs[4 * r + 2][:], v_refs[4 * r + 3][:]])
        acc_h = jnp.zeros((tile,), win_h.dtype)
        acc_l = jnp.zeros((tile,), win_h.dtype)
        for d in range(len(offsets)):
            s = h + offsets[d]
            svh = win_h[s : s + tile]
            svl = win_l[s : s + tile]
            ph, e = two_prod(hi_ref[d, :], svh)
            e = e + (hi_ref[d, :] * svl + lo_ref[d, :] * svh
                     + lo_ref[d, :] * svl + lo2_ref[d, :] * svh)
            ph, pl = fast_two_sum(ph, e)
            acc_h, acc_l = df_add(acc_h, acc_l, ph, pl)
        out_refs[2 * r][:] = acc_h
        out_refs[2 * r + 1][:] = acc_l


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "n_out", "h")
)
def _df_spmv_padded(offsets, hi_p, lo_p, lo2_p, vps, *, tile, interpret,
                    n_out, h):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiags, n_pad = hi_p.shape
    nrhs = len(vps) // 2
    grid = (n_pad // tile,)

    kernel = functools.partial(_df_dia_kernel, tuple(offsets), tile, h, nrhs)
    data_spec = pl.BlockSpec((ndiags, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    vec_specs = []
    for _ in range(2 * nrhs):  # each word array: blocks i and i+1
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i + 1,), memory_space=pltpu.VMEM)
        )
    itemsize = hi_p.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec] * 3 + vec_specs,
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(2 * nrhs)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), hi_p.dtype)
            for _ in range(2 * nrhs)
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * ndiags * n_pad * nrhs,
            bytes_accessed=(3 * ndiags + 6 * nrhs) * n_pad * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hi_p, lo_p, lo2_p, *[x for v in vps for x in (v, v)])
    outs = tuple(y[:n_out] for y in out)
    from .doublefloat import DF

    return tuple(DF(outs[2 * r], outs[2 * r + 1]) for r in range(nrhs))


def _pad_df(offsets, hi, lo, lo2, vs, tile):
    """vs: flat list of word arrays (vh, vl per rhs)."""
    h = max(abs(int(o)) for o in offsets)
    if 2 * h > tile:
        raise ValueError(f"halo {h} too wide for tile {tile}")
    n = hi.shape[1]
    n_pad = _round_up(n, tile)
    if n_pad != n:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad - n)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad - n)))
        lo2 = jnp.pad(lo2, ((0, 0), (0, n_pad - n)))
    vps = tuple(
        jnp.zeros((n_pad + tile,), v.dtype).at[h : h + n].set(v) for v in vs
    )
    return hi, lo, lo2, vps, n, h


def df_dia_spmv(offsets, hi, lo, lo2, v, *, tile=DEFAULT_TILE,
                interpret=None):
    """``A @ v`` with A the exact three-word split, v a DF pair.

    Returns a DF result with the identical EFT ordering of
    :meth:`~.doublefloat.DFOperator._mv_dia`, one pass over the words.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi_p, lo_p, lo2_p, vps, n, h = _pad_df(
        offsets, hi, lo, lo2, (v.hi, v.lo), tile
    )
    (y,) = _df_spmv_padded(
        tuple(offsets), hi_p, lo_p, lo2_p, vps, tile=tile,
        interpret=interpret, n_out=n, h=h,
    )
    return y


def df_dia_spmv2(offsets, hi, lo, lo2, v, w, *, tile=DEFAULT_TILE,
                 interpret=None):
    """Fused 2-RHS double-word SpMV: word arrays stream HBM once."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi_p, lo_p, lo2_p, vps, n, h = _pad_df(
        offsets, hi, lo, lo2, (v.hi, v.lo, w.hi, w.lo), tile
    )
    return _df_spmv_padded(
        tuple(offsets), hi_p, lo_p, lo2_p, vps, tile=tile,
        interpret=interpret, n_out=n, h=h,
    )


# ---------------------------------------------------------------------------
# Double-word DENSE SpMV: the small-fixture accuracy path.
#
# The accuracy-study fixtures (bcsstk03 ... 1138_bus) are small enough
# that their DF solves are DISPATCH-bound, not flops-bound: the unfused
# gather-ELL formulation issues ~40 tiny device ops per matvec and
# measured 7.5x the f32 cost (benchmarks/f32x2_cost.json round 4).
# This kernel runs the whole EFT contraction — elementwise two_prod of
# the hi words, cross terms against all three data words, and a
# double-word TREE REDUCTION along the row — as ONE device op.  O(n^2)
# VPU flops are nothing at these sizes; the win is the op count.
# ---------------------------------------------------------------------------

#: row-tile of the dense kernel; the column dim is padded to a power of
#: two so the in-kernel df_add halving tree stays shape-regular
DENSE_ROW_TILE = 128
DENSE_MAX_N = 8192


def supports_df_dense(n: int) -> bool:
    return n <= DENSE_MAX_N


def _df_dense_kernel(ncols, nrhs, hi_ref, lo_ref, lo2_ref, *refs):
    v_refs = refs[: 2 * nrhs]
    out_refs = refs[2 * nrhs :]
    ah = hi_ref[...]
    al = lo_ref[...]
    al2 = lo2_ref[...]
    for r in range(nrhs):
        vh = v_refs[2 * r][...]
        vl = v_refs[2 * r + 1][...]
        p, e = two_prod(ah, vh)
        e = e + (ah * vl + al * vh + al * vl + al2 * vh)
        hi, lo = fast_two_sum(p, e)
        w = ncols
        while w > 1:
            half = w // 2
            hi, lo = df_add(hi[:, :half], lo[:, :half],
                            hi[:, half:w], lo[:, half:w])
            w = half
        out_refs[2 * r][...] = hi
        out_refs[2 * r + 1][...] = lo


@functools.partial(jax.jit, static_argnames=("interpret", "nrhs"))
def _df_dense_padded(hi_p, lo_p, lo2_p, vws, *, interpret, nrhs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, ncols = hi_p.shape
    grid = (n_rows // DENSE_ROW_TILE,)
    mat_spec = pl.BlockSpec((DENSE_ROW_TILE, ncols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, ncols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((DENSE_ROW_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_df_dense_kernel, ncols, nrhs),
        grid=grid,
        in_specs=[mat_spec] * 3 + [vec_spec] * 2 * nrhs,
        out_specs=[out_spec] * 2 * nrhs,
        out_shape=[jax.ShapeDtypeStruct((n_rows, 1), hi_p.dtype)] * 2 * nrhs,
        cost_estimate=pl.CostEstimate(
            flops=40 * n_rows * ncols * nrhs,
            bytes_accessed=3 * n_rows * ncols * hi_p.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hi_p, lo_p, lo2_p, *vws)
    return outs


def _pow2(x: int) -> int:
    m = 1
    while m < x:
        m *= 2
    return m


def _pad_dense(hi, lo, lo2, vs):
    n, m = hi.shape
    n_pad = _round_up(n, DENSE_ROW_TILE)
    m_pad = max(_pow2(m), 128)
    padm = ((0, n_pad - n), (0, m_pad - m))
    hi = jnp.pad(hi, padm)
    lo = jnp.pad(lo, padm)
    lo2 = jnp.pad(lo2, padm)
    vws = [jnp.pad(v, (0, m_pad - m)).reshape(1, m_pad) for v in vs]
    return hi, lo, lo2, vws, n


def df_dense_spmv(hi, lo, lo2, v, *, interpret=None):
    """``A @ v`` for a dense exact three-word split, one device op."""
    from .doublefloat import DF

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi_p, lo_p, lo2_p, vws, n = _pad_dense(hi, lo, lo2, (v.hi, v.lo))
    yh, yl = _df_dense_padded(hi_p, lo_p, lo2_p, vws,
                              interpret=interpret, nrhs=1)
    return DF(yh[:n, 0], yl[:n, 0])


def df_dense_spmv2(hi, lo, lo2, v, w, *, interpret=None):
    """Fused 2-RHS dense double-word SpMV (words stream VMEM once)."""
    from .doublefloat import DF

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hi_p, lo_p, lo2_p, vws, n = _pad_dense(
        hi, lo, lo2, (v.hi, v.lo, w.hi, w.lo))
    yh, yl, zh, zl = _df_dense_padded(hi_p, lo_p, lo2_p, vws,
                                      interpret=interpret, nrhs=2)
    return DF(yh[:n, 0], yl[:n, 0]), DF(zh[:n, 0], zl[:n, 0])


# ---------------------------------------------------------------------------
# Double-word PIPE vector phase: 5 DF AXPYs + the 4 DF dot partials of
# the single sync phase in ONE kernel.
#
# With the DIA DF SpMV above, this makes the whole f32x2 pipe-P/PR
# iteration TWO device ops (plus O(1) scalar glue): the remaining
# fusion-disabled elementwise graph — ~25 unfused HBM-materializing ops
# over 6 double-word vectors — collapses into a single pass.  The pipe
# family is the only one whose sync-phase dots read ONLY pre-matvec
# vectors, which is what makes this split exact.
# ---------------------------------------------------------------------------


def _df_axpy(vh, vl, ch, cl, wh, wl, sign=1.0):
    """(v + sign * c*w) in double-word arithmetic; c is a DF scalar."""
    ph, pl = _mul_hi_lo_k(ch, cl, wh, wl)
    if sign < 0:
        ph, pl = -ph, -pl
    return df_add(vh, vl, ph, pl)


def _mul_hi_lo_k(ah, al, bh, bl):
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh + al * bl)
    return fast_two_sum(p, e)


def _df_lane_fold(ph, pl, rows):
    """(tile,) DF pair -> (128,) DF pair via a df_add halving tree."""
    hi = ph.reshape(rows, 128)
    lo = pl.reshape(rows, 128)
    m = rows
    while m > 1:
        half = m // 2
        hi, lo = df_add(hi[:half], lo[:half], hi[half:m], lo[half:m])
        m = half
    return hi[0], lo[0]


def _df_pipe_kernel(tile, *refs):
    import jax.experimental.pallas as pl  # noqa: F401  (grid-independent)

    (xh, xl, rh, rl, wh, wl, uh, ul, ph_, pl_, sh, sl, ab) = refs[:13]
    outs = refs[13:]
    rows = tile // 128
    a1h, a1l, bh, bl = ab[0], ab[1], ab[2], ab[3]

    x2 = _df_axpy(xh[:], xl[:], a1h, a1l, ph_[:], pl_[:])
    r2 = _df_axpy(rh[:], rl[:], a1h, a1l, sh[:], sl[:], sign=-1.0)
    w2 = _df_axpy(wh[:], wl[:], a1h, a1l, uh[:], ul[:], sign=-1.0)
    p2 = _df_axpy(r2[0], r2[1], bh, bl, ph_[:], pl_[:])
    s2 = _df_axpy(w2[0], w2[1], bh, bl, sh[:], sl[:])
    for o, val in zip(outs[:10], (*x2, *r2, *w2, *p2, *s2)):
        o[:] = val

    # local partials: mu = p2.s2, delta = r2.s2, gamma = s2.s2, nu = r2.r2
    zero = jnp.zeros((128,), x2[0].dtype)
    his, los = [], []
    for (avh, avl), (bvh, bvl) in (((p2), (s2)), ((r2), (s2)),
                                   ((s2), (s2)), ((r2), (r2))):
        prh, pre = two_prod(avh, bvh)
        pre = pre + (avh * bvl + avl * bvh + avl * bvl)
        fh, fl = _df_lane_fold(prh, pre, rows)
        his.append(fh)
        los.append(fl)
    outs[10][0] = jnp.stack(his + [zero] * 4)
    outs[11][0] = jnp.stack(los + [zero] * 4)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def df_pipe_vector_phase(x, r, w, u, p, s, a1, beta, *, tile=DEFAULT_TILE,
                         interpret=None):
    """DF pipe vector phase: ``(x2, r2, w2, p2, s2, (mu, delta, gamma,
    nu))`` with the same DF semantics as the generic formulation.  The
    dot partials fold lanes in-kernel; the (nt, 8, 128) hi/lo planes
    combine in a double-word tree outside (tiny)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .doublefloat import DF

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.hi.shape[0]
    n_pad = _round_up(n, tile)
    pad = n_pad - n

    def pad1(v):
        return jnp.pad(v, (0, pad)) if pad else v

    vecs = [pad1(a) for v in (x, r, w, u, p, s) for a in (v.hi, v.lo)]
    ab = jnp.stack([a1.hi, a1.lo, beta.hi, beta.lo]).astype(x.hi.dtype)
    nt = n_pad // tile
    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    dots_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_df_pipe_kernel, tile),
        grid=(nt,),
        in_specs=[vec_spec] * 12 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 10 + [dots_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), x.hi.dtype)] * 10
        + [jax.ShapeDtypeStruct((nt, 8, 128), x.hi.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=250 * n_pad,
            bytes_accessed=22 * n_pad * x.hi.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*vecs, ab)
    vo = outs[:10]
    if pad:
        vo = [v[:n] for v in vo]
    x2, r2, w2, p2, s2 = (DF(vo[2 * i], vo[2 * i + 1]) for i in range(5))
    # cross-tile + cross-lane combine in double-word arithmetic (tiny:
    # (nt, 8, 128) pairs; runs under _df_jit so the EFTs hold)
    hi = outs[10].reshape(nt, 8, 128)
    lo = outs[11].reshape(nt, 8, 128)
    m = nt
    while m > 1:
        half = m // 2
        hi, lo = df_add(hi[:half], lo[:half], hi[half:m], lo[half:m])
        m = half
    hi, lo = hi[0], lo[0]  # (8, 128)
    dots = []
    for i in range(4):
        h, l = hi[i], lo[i]
        mm = 128
        while mm > 1:
            half = mm // 2
            h, l = df_add(h[:half], l[:half], h[half:mm], l[half:mm])
            mm = half
        dots.append(DF(h[0], l[0]))
    return x2, r2, w2, p2, s2, tuple(dots)
