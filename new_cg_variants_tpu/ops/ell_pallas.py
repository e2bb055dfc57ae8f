"""EXPERIMENTAL Pallas gather kernel for padded-ELL SpMV.

The XLA gather formulation of :class:`~.operators.EllOperator` sustains
~40M gathered elements/s on TPU (latency-class; PERF.md §general-sparse)
— the documented ~600x gap for band-irreducible matrices that cannot
take the block-banded MXU path.  This kernel keeps the WHOLE vector
resident in VMEM (fits for n up to ~8M f32) and performs the gather
in-kernel over row tiles, betting on Mosaic's dynamic-gather lowering
beating XLA's scalar-unit gather.

Status: validated in interpret mode; REJECTED by the real toolchain
(``benchmarks/ell_kernel_check.json``: ``NotImplementedError('Only 2D
gather is supported')`` — Mosaic's dynamic gather is lane-preserving
``take_along_axis``-style only, while an arbitrary-pattern SpMV gather
is inherently lane-crossing).  The kernel stays OPT-IN
(``NCGV_ELL_KERNEL=1``) as the ready implementation for a future
toolchain; the production mitigations for band-irreducible matrices
remain the loud auto-route warning + the block-banded MXU path
(PERF.md §general-sparse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ell_spmv", "supports_ell_kernel"]

ROW_TILE = 512
#: whole-vector VMEM residency bound (f32 words)
MAX_N = 4_000_000


def supports_ell_kernel(n: int) -> bool:
    return n <= MAX_N


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ell_kernel(val_ref, idx_ref, v_ref, out_ref):
    v = v_ref[...]
    idx = idx_ref[...]
    g = jnp.take(v, idx, axis=0)  # (R, L) gather from the resident vector
    out_ref[...] = jnp.sum(val_ref[...] * g, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_spmv_padded(val_p, idx_p, v_p, *, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, L = val_p.shape
    grid = (n_rows // ROW_TILE,)
    out = pl.pallas_call(
        _ell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_p.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 1), val_p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * L,
            bytes_accessed=(2 * n_rows * L + v_p.shape[0])
            * val_p.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(val_p, idx_p, v_p)
    return out


def ell_spmv(val, idx, v, *, interpret=None):
    """``y = A @ v`` for padded-ELL ``(val, idx)``, in-kernel gather."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, L = val.shape
    n_rows = _round_up(n, ROW_TILE)
    n_vec = _round_up(v.shape[0], 128)
    val_p = jnp.pad(val, ((0, n_rows - n), (0, 0)))
    # pad rows gather index 0 with value 0 — harmless
    idx_p = jnp.pad(idx, ((0, n_rows - n), (0, 0)))
    v_p = jnp.pad(v, (0, n_vec - v.shape[0]))
    out = _ell_spmv_padded(val_p, idx_p.astype(jnp.int32), v_p,
                           interpret=interpret)
    return out[:n, 0]
