"""Pallas TPU kernels for DIA (banded/diagonal) SpMV.

The XLA lowering of :meth:`~.operators.DiaOperator.mv` materialises one
shifted copy of the vector per diagonal (65 copies for the PETSc k=32
model problem), pushing an HBM-roofline ~0.25 ms/iter problem to several
ms.  These kernels make the single pass explicit: the diagonal data array
streams HBM -> VMEM once, row-tiled, and every shifted read is a VMEM
slice.

Shift mechanics: Mosaic on this toolchain rejects dynamic slices whose
start is program-id-dependent and not tile-aligned, so the kernel never
slices dynamically.  The padded vector is passed TWICE with adjacent
block index maps (``i`` and ``i+1``); their concatenation is the local
window ``vp[i*T : i*T + 2T]`` and every diagonal's shifted read is a
*static* slice ``window[h+off : h+off+T]`` (valid while the halo
``h = max|offset|`` satisfies ``2h <= T``).  Each vector element is
fetched twice — negligible next to the diagonal data, which dominates
traffic ~ndiags:1.

``dia_spmv2`` applies A to two right-hand sides in the same pass over
the data — the fused 2-RHS matvec the pipelined predict-and-recompute
variants need every iteration (the reference's ``np.dot(A, [r|s])``
packing, ``scaling_experiments_mpi4py/cg_variants/pipe_pr_cg.py:65``,
and the two overlapped ``MatMult`` calls of
``scaling_experiments_petsc/cg_impls/pipeprcg.c:162-170``).

Layout contract: ``data[d, i] = A[i, i + offsets[d]]`` (row-indexed DIA,
explicit zeros outside the matrix).  Zero padding in the halo IS the
matrix boundary condition; the distributed row-shard context reuses the
same kernel with real neighbor rows in the halo slots instead of zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dia_spmv", "dia_spmv2", "supports", "DEFAULT_TILE"]

# Measured: tile 4096 sustains 597.6 GB/s vs 2048's 560.2 on the v5e
# read-ceiling microbenchmark (benchmarks/pallas_ceiling.json), and the
# fused full step improved 18.6% at 4096 (BENCH tile A/B, PERF.md).
DEFAULT_TILE = 4096


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports(offsets, tile: int = DEFAULT_TILE) -> bool:
    """Fast path requires the band to fit the static-slice window."""
    h = max(abs(int(o)) for o in offsets)
    return 2 * h <= tile


def _dia_kernel(offsets, tile, h, nrhs, *refs):
    """One row tile: y[j] = sum_d data[d, j] * window[j + h + off_d]."""
    data_ref = refs[0]
    v_refs = refs[1 : 1 + 2 * nrhs]
    out_refs = refs[1 + 2 * nrhs :]
    # bf16 storage tier: convert the whole block once (per-row extracts
    # from packed bf16 sublane tiles relayout per read — see sym_dia.py)
    if data_ref.dtype != v_refs[0].dtype:
        _data = data_ref[...].astype(v_refs[0].dtype)

        def dat(d):
            return _data[d, :]
    else:
        def dat(d):
            return data_ref[d, :]
    for r in range(nrhs):
        window = jnp.concatenate([v_refs[2 * r][:], v_refs[2 * r + 1][:]])
        s0 = h + offsets[0]
        acc = dat(0) * window[s0 : s0 + tile]
        for d in range(1, len(offsets)):
            s = h + offsets[d]
            acc = acc + dat(d) * window[s : s + tile]
        out_refs[r][:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "n_out", "h")
)
def _dia_spmv_padded(offsets, data_p, vps, *, tile, interpret, n_out, h):
    """Core pallas_call on pre-padded operands.

    ``data_p``: (ndiags, n_pad) with ``n_pad % tile == 0``; each element
    of ``vps`` has length ``n_pad + tile`` with the vector at offset
    ``h`` (front halo) — blocks ``i`` and ``i+1`` of size ``tile`` cover
    every window.  Returns a tuple of (n_out,) results.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiags, n_pad = data_p.shape
    nrhs = len(vps)
    grid = (n_pad // tile,)

    kernel = functools.partial(_dia_kernel, tuple(offsets), tile, h, nrhs)
    vec_specs = []
    for _ in range(nrhs):
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i + 1,), memory_space=pltpu.VMEM)
        )
    itemsize = data_p.dtype.itemsize
    # outputs take the VECTOR dtype (bf16 storage tier: bf16 data, f32
    # compute — the in-kernel product promotes elementwise)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ]
        + vec_specs,
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(nrhs)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), vps[0].dtype) for _ in range(nrhs)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiags * n_pad * nrhs,
            bytes_accessed=(ndiags + 3 * nrhs) * n_pad * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data_p, *[x for v in vps for x in (v, v)])
    return tuple(y[:n_out] for y in out)


def _pad_operands(offsets, data, vs, tile):
    h = max(abs(int(o)) for o in offsets)
    if 2 * h > tile:
        raise ValueError(f"halo {h} too wide for tile {tile}")
    n = data.shape[1]
    n_pad = _round_up(n, tile)
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    # length n_pad + tile: front halo h, the rest zero ⇒ block i+1 of the
    # last grid step stays in-bounds and reads zeros past the matrix end.
    vps = tuple(
        jnp.zeros((n_pad + tile,), v.dtype).at[h : h + n].set(v) for v in vs
    )
    return data, vps, n, h


def dia_spmv(offsets, data, v, *, tile=DEFAULT_TILE, interpret=None):
    """``y = A @ v`` for a row-indexed DIA operator, one pass over data."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n, h = _pad_operands(offsets, data, (v,), tile)
    (y,) = _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=n, h=h
    )
    return y


def dia_spmv2(offsets, data, v, w, *, tile=DEFAULT_TILE, interpret=None):
    """``(A @ v, A @ w)`` fused: data is streamed from HBM exactly once."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n, h = _pad_operands(offsets, data, (v, w), tile)
    return _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=n, h=h
    )


def _pad_operands_ext(offsets, data, vexts, tile):
    """Pre-padded operands for halo-extended vectors.

    ``vexts`` are ``[left_h | v | right_h]`` arrays of length ``m + 2h``
    (the distributed row shard's post-ppermute layout) — the halo slots
    take the place of the zero padding of :func:`_pad_operands`, so the
    kernel math is unchanged.
    """
    h = max(abs(int(o)) for o in offsets)
    if 2 * h > tile:
        raise ValueError(f"halo {h} too wide for tile {tile}")
    m = data.shape[1]
    n_pad = _round_up(m, tile)
    if n_pad != m:
        data = jnp.pad(data, ((0, 0), (0, n_pad - m)))
    vps = tuple(
        jnp.zeros((n_pad + tile,), v.dtype).at[: m + 2 * h].set(v)
        for v in vexts
    )
    return data, vps, m, h


def dia_spmv_ext(offsets, data, vext, *, tile=DEFAULT_TILE, interpret=None):
    """Local-shard SpMV: ``vext`` already carries the halo rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, m, h = _pad_operands_ext(offsets, data, (vext,), tile)
    (y,) = _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=m, h=h
    )
    return y


def dia_spmv2_ext(offsets, data, vext, wext, *, tile=DEFAULT_TILE, interpret=None):
    """Fused 2-RHS local-shard SpMV on halo-extended vectors."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, m, h = _pad_operands_ext(offsets, data, (vext, wext), tile)
    return _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=m, h=h
    )
