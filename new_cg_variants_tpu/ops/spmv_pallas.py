"""Pallas TPU kernels for DIA (banded/diagonal) SpMV.

The XLA lowering of :meth:`~.operators.DiaOperator.mv` materialises one
shifted copy of the vector per diagonal (65 copies for the PETSc k=32
model problem), pushing an HBM-roofline ~0.25 ms/iter problem to several
ms.  These kernels make the single pass explicit:

* the diagonal data array streams HBM -> VMEM once, row-tiled;
* the (padded) vector is pinned whole in VMEM for the kernel's lifetime,
  so every shifted read is a VMEM lane-rotate, not an HBM re-read;
* ``dia_spmv2`` applies A to two right-hand sides in the same pass over
  the data — the fused 2-RHS matvec the pipelined predict-and-recompute
  variants need every iteration (the reference's ``np.dot(A, [r|s])``
  packing, ``scaling_experiments_mpi4py/cg_variants/pipe_pr_cg.py:65``,
  and the two overlapped ``MatMult`` calls of
  ``scaling_experiments_petsc/cg_impls/pipeprcg.c:162-170``).

Layout: ``data[d, i] = A[i, i + offsets[d]]`` (row-indexed DIA, explicit
zeros outside the matrix).  The kernel contract takes a *pre-padded*
vector ``vp`` of length ``n_pad + 2h`` with ``vp[h : h + n] = v`` and
zeros elsewhere (``h = max|offset|``), so that row ``i`` reads
``vp[h + i + off]`` with no bounds checks; the zero padding IS the matrix
boundary condition.  The same contract serves the distributed row-shard
context, where the padding slots hold real halo rows from the ICI
neighbors instead of zeros.

VMEM budget: the resident vector costs ``4*(n_pad+2h)`` bytes (×2 for the
2-RHS kernel) plus a double-buffered ``(ndiags, tile)`` data block.
:func:`fits_vmem` gates the fast path; callers fall back to the XLA
formulation beyond it (a block-sliced variant can lift this later).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dia_spmv", "dia_spmv2", "fits_vmem", "DEFAULT_TILE"]

DEFAULT_TILE = 2048
# Leave room for double-buffered data blocks + outputs in 16 MB of VMEM.
_VMEM_VECTOR_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fits_vmem(n: int, h: int, nrhs: int = 1, dtype_bytes: int = 4) -> bool:
    """Whether the resident-vector strategy fits the VMEM budget."""
    n_pad = _round_up(max(n, 1), DEFAULT_TILE)
    return nrhs * (n_pad + 2 * h) * dtype_bytes <= _VMEM_VECTOR_BUDGET


def _dia_kernel(offsets, tile, h, nrhs, *refs):
    """y[j] = sum_d data[d, j] * vp[base + j + off_d] on one row tile."""
    import jax.experimental.pallas as pl

    data_ref = refs[0]
    vp_refs = refs[1 : 1 + nrhs]
    out_refs = refs[1 + nrhs :]
    i = pl.program_id(0)
    base = i * tile + h
    for r in range(nrhs):
        acc = data_ref[0, :] * vp_refs[r][pl.ds(base + offsets[0], tile)]
        for d in range(1, len(offsets)):
            acc = acc + data_ref[d, :] * vp_refs[r][pl.ds(base + offsets[d], tile)]
        out_refs[r][:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "n_out")
)
def _dia_spmv_padded(offsets, data_p, vps, *, tile, interpret, n_out):
    """Core pallas_call on pre-padded operands.

    ``data_p``: (ndiags, n_pad); ``vps``: tuple of (n_pad + 2h,) vectors.
    Returns a tuple of (n_out,) results.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiags, n_pad = data_p.shape
    h = max(abs(o) for o in offsets)
    nrhs = len(vps)
    grid = (n_pad // tile,)

    kernel = functools.partial(_dia_kernel, offsets, tile, h, nrhs)
    flops = 2 * ndiags * n_pad * nrhs
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(nrhs)],
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(nrhs)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), data_p.dtype) for _ in range(nrhs)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=data_p.size * data_p.dtype.itemsize
            + sum(v.size * v.dtype.itemsize for v in vps),
            transcendentals=0,
        ),
        interpret=interpret,
    )(data_p, *vps)
    return tuple(y[:n_out] for y in out)


def _pad_operands(offsets, data, vs, tile):
    h = max(abs(o) for o in offsets)
    n = data.shape[1]
    n_pad = _round_up(n, tile)
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    vps = tuple(
        jnp.zeros((n_pad + 2 * h,), v.dtype).at[h : h + n].set(v) for v in vs
    )
    return data, vps, n


def dia_spmv(offsets, data, v, *, tile=DEFAULT_TILE, interpret=None):
    """``y = A @ v`` for a row-indexed DIA operator, one pass over data."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n = _pad_operands(offsets, data, (v,), tile)
    (y,) = _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=n
    )
    return y


def dia_spmv2(offsets, data, v, w, *, tile=DEFAULT_TILE, interpret=None):
    """``(A @ v, A @ w)`` fused: data is streamed from HBM exactly once."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n = _pad_operands(offsets, data, (v, w), tile)
    return _dia_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret, n_out=n
    )
