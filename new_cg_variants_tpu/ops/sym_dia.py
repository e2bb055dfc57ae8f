"""Symmetric DIA storage: half the matrix traffic for SPD operators.

CG solves SPD systems by definition, and every matrix in the reference
(fixtures and model problems) is symmetric — yet DIA stores both
triangles, and at the headline scale the solve is pure HBM bandwidth
(PERF.md: ~0.245 ms/iter ≈ the 196 MB/iter wall).  Storing only the
main + upper diagonals halves the dominant traffic term.

Math: with ``data[d, i] = A[i, i + offsets[d]]`` for ``offsets[d] >= 0``
(explicit zeros past the matrix edge),

    y[i] = sum_d data[d, i] * v[i + off_d]                (upper + main)
         + sum_{d: off_d > 0} data[d, i - off_d] * v[i - off_d]   (mirror)

The mirror term needs ``data`` at row ``i - off``; re-reading a shifted
data window would double the traffic back to full storage.  Instead the
Pallas kernel exploits the TPU grid's SEQUENTIAL execution: define
``u_d = data[d] * v`` elementwise on the tile; the mirror contribution
to y is ``u_d`` shifted RIGHT by ``off_d``, whose first ``off_d`` rows
belong to the PREVIOUS tile — carried across grid steps in a VMEM
scratch ("spill") buffer.  One pass over the half-band, O(tile) scratch.

The XLA fallback (CPU/tests) materializes both shift directions — fine
off-TPU where this formulation is about traffic, not correctness.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .operators import _shift

__all__ = ["SymDiaOperator", "sym_dia_spmv", "sym_dia_spmv2"]

DEFAULT_TILE = 4096


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sym_kernel(offsets, tile, h, nrhs, *refs):
    """One row tile with mirror-spill carry.

    refs: data_ref, (v lo/hi) * nrhs, out * nrhs, spill scratch * nrhs.
    ``offsets`` are the stored (>= 0) offsets; ``offsets[0] == 0`` is the
    main diagonal.  The spill scratch (tile-wide; only rows < h are ever
    nonzero) carries the mirror contribution of THIS tile's
    ``u_d = data[d] * v`` into the NEXT tile's first rows — the TPU grid
    runs sequentially (ARBITRARY semantics), so scratch persists across
    steps and the half-band is read exactly once.

    Mosaic shape notes (all probed on the real toolchain): every 1-D
    realization of a small RIGHT shift is unsupported — deep tail slices
    and lane-offset>=128 concats hit "Input offsets outside of the first
    tile", and a 1-D ``pltpu.roll`` lowers to an unimplemented
    ``tpu.dynamic_rotate``.  The shift is therefore decomposed in the
    native (sublane, lane) layout: reshape the tile to (tile/128, 128),
    lane-rotate by ``off``, sublane-rotate the result by 1, and select —
    ``y[r, c] = x[r, c-off]`` for lanes ``c >= off`` comes from the lane
    rotate, lanes ``c < off`` take the previous row's wrapped values
    from the sublane rotate, and the (row 0, c < off) wraparound cells
    are EXACTLY the next tile's spill (row R-1's tail), split off by the
    same mask.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    data_ref = refs[0]
    v_refs = refs[1 : 1 + 2 * nrhs]
    out_refs = refs[1 + 2 * nrhs : 1 + 3 * nrhs]
    spill_refs = refs[1 + 3 * nrhs :]

    step = pl.program_id(0)
    rows = tile // 128
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)

    from .fused_step import _data_rows

    dat = _data_rows(data_ref, v_refs[0].dtype)

    for r in range(nrhs):
        window = jnp.concatenate([v_refs[2 * r][:], v_refs[2 * r + 1][:]])
        v_local = window[h : h + tile]
        # upper + main: data[d, i] * v[i + off]
        acc = dat(0) * v_local  # off = 0
        for d in range(1, len(offsets)):
            s = h + offsets[d]
            acc = acc + dat(d) * window[s : s + tile]
        # mirror terms + spill from the previous tile.  Per diagonal:
        # lane-rotate u_d and split by lane index into the stay-in-row
        # plane (pa) and the wraps-to-next-row plane (pb); the sublane
        # carry is linear and off-independent, so pb rolls ONCE after
        # the loop (row 0 of the rolled plane = next tile's spill).
        acc = acc + jnp.where(step > 0, spill_refs[r][:], 0.0)
        tot = jnp.zeros((rows, 128), acc.dtype)
        pb = jnp.zeros((rows, 128), acc.dtype)
        for d in range(1, len(offsets)):
            off = offsets[d]
            u2 = (dat(d) * v_local).reshape(rows, 128)
            rl = pltpu.roll(u2, off, 1)
            tot = tot + rl
            pb = pb + jnp.where(lane2 < off, rl, 0.0)
        # in-row plane = total - wrapped plane (one subtract per pass
        # instead of a second select+add per diagonal)
        pa = tot - pb
        br = pltpu.roll(pb, 1, 0)
        acc = acc + (pa + jnp.where(row2 == 0, 0.0, br)).reshape(tile)
        spill_refs[r][:] = jnp.where(row2 == 0, br, 0.0).reshape(tile)
        out_refs[r][:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "n_out", "h")
)
def _sym_spmv_padded(offsets, data_p, vps, *, tile, interpret, n_out, h):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiags, n_pad = data_p.shape
    nrhs = len(vps)
    grid = (n_pad // tile,)

    kernel = functools.partial(_sym_kernel, tuple(offsets), tile, h, nrhs)
    vec_specs = []
    for _ in range(nrhs):
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
        vec_specs.append(
            pl.BlockSpec((tile,), lambda i: (i + 1,), memory_space=pltpu.VMEM)
        )
    itemsize = data_p.dtype.itemsize
    # outputs/scratch take the VECTOR dtype: with the bf16 storage tier
    # the data streams bf16 but the kernel computes (and spills) in f32
    vdtype = vps[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndiags, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ]
        + vec_specs,
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(nrhs)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), vdtype) for _ in range(nrhs)
        ],
        scratch_shapes=[pltpu.VMEM((tile,), vdtype) for _ in range(nrhs)],
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the spill scratch carries across steps
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * ndiags * n_pad * nrhs,
            bytes_accessed=(ndiags + 3 * nrhs) * n_pad * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data_p, *[x for v in vps for x in (v, v)])
    return tuple(y[:n_out] for y in out)


def _pad_sym(offsets, data, vs, tile):
    h = max(int(o) for o in offsets)
    if h and (2 * h > tile):
        raise ValueError(f"halo {h} too wide for tile {tile}")
    if h >= 128:
        # the (lane rotate + one sublane carry) decomposition covers
        # shifts < one lane row; wider bands need a multi-row carry
        raise ValueError(f"half-band {h} >= 128 unsupported by the kernel")
    if tile % 128:
        raise ValueError(f"tile {tile} must be a multiple of 128")
    n = data.shape[1]
    n_pad = _round_up(n, tile)
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    vps = tuple(
        jnp.zeros((n_pad + tile,), v.dtype).at[h : h + n].set(v) for v in vs
    )
    return data, vps, n, h


def sym_dia_spmv(offsets, data, v, *, tile=DEFAULT_TILE, interpret=None):
    """``y = A @ v`` for symmetric A stored as main+upper diagonals."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n, h = _pad_sym(offsets, data, (v,), tile)
    (y,) = _sym_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret,
        n_out=n, h=h,
    )
    return y


def sym_dia_spmv2(offsets, data, v, w, *, tile=DEFAULT_TILE, interpret=None):
    """Fused 2-RHS symmetric SpMV: half-band streamed from HBM once."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    data_p, vps, n, h = _pad_sym(offsets, data, (v, w), tile)
    return _sym_spmv_padded(
        tuple(offsets), data_p, vps, tile=tile, interpret=interpret,
        n_out=n, h=h,
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class SymDiaOperator:
    """Symmetric banded operator: main + upper diagonals only.

    ``offsets`` are the stored non-negative offsets (0 first);
    ``data[d, i] = A[i, i + offsets[d]]`` with explicit zeros where
    ``i + offsets[d] >= n``.  ``mv``/``mv2`` dispatch to the Pallas
    half-band kernel on TPU and the XLA two-shift formulation elsewhere.
    """

    offsets: tuple
    data: jnp.ndarray  # (n_upper_diags, n)

    def __post_init__(self):
        assert self.offsets[0] == 0 and all(o >= 0 for o in self.offsets)

    @property
    def n(self) -> int:
        return self.data.shape[1]

    @property
    def nnz(self) -> int:
        n = self.n
        return int(sum((n - o) * (1 if o == 0 else 2) for o in self.offsets))

    @property
    def dtype(self):
        return self.data.dtype

    def _use_pallas(self) -> bool:
        """Kernel dispatch: on by default on TPU for half-bands < 128
        (the lane-rotate + single-sublane-carry decomposition's domain);
        ``NCGV_SYMDIA_KERNEL=0`` or ``NCGV_DISABLE_PALLAS`` fall back to
        the XLA mirror formulation.

        Like every other ``NCGV_*`` kernel flag, the env vars are read
        at TRACE time: a solve jitted before the flag changes keeps the
        path it compiled with until its cache entry is dropped
        (re-trace).  Set the flags before the first traced call.
        """
        import os

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        if os.environ.get("NCGV_SYMDIA_KERNEL", "") == "0":
            return False
        h = max(int(o) for o in self.offsets)
        return (jax.default_backend() == "tpu" and h < 128
                and 2 * h <= DEFAULT_TILE)

    def mv(self, v):
        if self._use_pallas():
            return sym_dia_spmv(self.offsets, self.data, v)
        return self._mv_xla(v)

    def mv2(self, v, w):
        if self._use_pallas():
            return sym_dia_spmv2(self.offsets, self.data, v, w)
        return self._mv_xla(v), self._mv_xla(w)

    def _mv_xla(self, v):
        y = self.data[0] * v
        for d in range(1, len(self.offsets)):
            off = self.offsets[d]
            y = y + self.data[d] * _shift(v, off)
            # mirror: data[d, i-off] * v[i-off] == shift(data[d]*v, -off)
            y = y + _shift(self.data[d] * v, -off)
        return y

    def diagonal(self):
        return self.data[0]

    def astype(self, dtype):
        return SymDiaOperator(self.offsets, jnp.asarray(self.data, dtype))

    def todia_host(self):
        """Full (two-triangle) band as host ``(offsets, np.float64 data)``.

        Stays in numpy end-to-end: the f32x2 mode splits this EXACTLY
        into three words, and a ``jnp.asarray`` round-trip on an
        x64-disabled (TPU) process would silently truncate the band to
        f32 first — collapsing the accuracy mode to the f32-matrix
        fixed bias it exists to remove.
        """
        n = self.n
        data = np.asarray(self.data, np.float64)
        offs = [int(o) for o in self.offsets]
        full_offs = sorted(set([-o for o in offs if o] + offs))
        full = np.zeros((len(full_offs), n), np.float64)
        for j, off in enumerate(full_offs):
            if off >= 0:
                full[j] = data[offs.index(off)]
            else:
                d = offs.index(-off)
                # A[i, i+off] = A[i+off, i] = data[d, i+off] (row-indexed)
                full[j, -off:] = data[d, : n + off]
        return tuple(full_offs), full

    def todia(self):
        """Full (two-triangle) DiaOperator with identical entries.

        NOTE: the returned operator's data goes through ``jnp.asarray``
        (device dtype rules apply); precision-critical consumers use
        :meth:`todia_host`.
        """
        from .operators import DiaOperator

        full_offs, full = self.todia_host()
        return DiaOperator(full_offs, jnp.asarray(full))

    def tocsr(self):
        return self.todia().tocsr()

    def todense(self):
        return self.todia().todense()

    def tree_flatten(self):
        return (self.data,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])
