"""Linear operators (TPU-native sparse/dense matrix formats).

The reference delegates its linear algebra to NumPy/SciPy CSR and PETSc
``mpiaij`` (SURVEY §1 L1).  General CSR is gather-bound on TPU, so this
layer provides formats chosen for the VPU/MXU instead:

* :class:`DenseOperator` — plain 2-D array, SpMV on the MXU.  Right format
  for the small SPD fixtures and the mpi4py-style column-partitioned runs.
* :class:`DiaOperator` — diagonal (DIA) storage, row-indexed.  SpMV is a
  sum of shifted elementwise multiplies — no gathers, fully VPU-friendly,
  and the natural format for the banded/diagonal model problems the
  scaling experiments use (``ex2a.c:77-95``, ``scaling_tests.py:51-54``).
  A Pallas kernel (:mod:`..ops.spmv_pallas`) reads the vector once per row
  tile instead of once per diagonal.
* :class:`EllOperator` — padded ELLPACK for general sparse fixtures: a
  dense ``(n, L)`` value array plus ``(n, L)`` column indices; SpMV is one
  gather + multiply + row-reduce, with static shapes XLA can tile.

All operators are pytrees so they can cross ``jit``/``shard_map``
boundaries, and expose::

    op.n           # dimension
    op.nnz         # stored nonzeros (excluding padding)
    op.mv(v)       # A @ v
    op.mv2(v, w)   # A @ v, A @ w fused (one pass over A)
    op.diagonal()  # main diagonal (for Jacobi preconditioning)

``mv2`` is first-class because the pipelined predict-and-recompute
variants apply A to two vectors per iteration; fusing them halves traffic
over A (the mpi4py code's ``np.dot(A, [r|s])`` trick,
``scaling_experiments_mpi4py/cg_variants/pipe_pr_cg.py:65``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DenseOperator",
    "DiaOperator",
    "EllOperator",
    "from_coo",
    "as_operator",
    "build_dense",
    "build_dia",
    "build_ell",
    "choose_format",
]


def _shift(v: jnp.ndarray, off: int) -> jnp.ndarray:
    """shift(v, off)[i] = v[i + off], zero-padded at the boundary."""
    if off == 0:
        return v
    zeros = jnp.zeros((abs(off),), dtype=v.dtype)
    if off > 0:
        return jnp.concatenate([v[off:], zeros])
    return jnp.concatenate([zeros, v[:off]])


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseOperator:
    """Dense SPD operator; SpMV = MXU matmul."""

    a: jnp.ndarray

    @property
    def n(self) -> int:
        return self.a.shape[0]

    @property
    def nnz(self) -> int:
        return int(self.a.shape[0] * self.a.shape[1])

    @property
    def dtype(self):
        return self.a.dtype

    def mv(self, v):
        return self.a @ v

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)
        out = self.a @ vw
        return out[:, 0], out[:, 1]

    def diagonal(self):
        return jnp.diagonal(self.a)

    def astype(self, dtype):
        # jnp.asarray (not ndarray.astype): a numpy-backed leaf must come
        # out device-resident, or every jit call receiving the operator
        # re-uploads it host->device (the round-3 suite measured the
        # tunnel, not the kernels — ~0.22 ms/iter on a 164 MB operator)
        return DenseOperator(jnp.asarray(self.a, dtype))

    def todense(self):
        return self.a

    def tocsr(self):
        import scipy.sparse as sp

        return sp.csr_matrix(np.asarray(self.a, dtype=np.float64))

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class DiaOperator:
    """Diagonal-storage operator, row-indexed.

    ``data[d, i] = A[i, i + offsets[d]]``; positions falling outside the
    matrix are stored as explicit zeros.  ``offsets`` is a static tuple so
    the shift pattern is compile-time constant.
    """

    offsets: tuple
    data: jnp.ndarray  # (ndiags, n)

    @property
    def n(self) -> int:
        return self.data.shape[1]

    @property
    def nnz(self) -> int:
        n = self.data.shape[1]
        return int(sum(n - abs(o) for o in self.offsets))

    @property
    def dtype(self):
        return self.data.dtype

    def _use_pallas(self) -> bool:
        import os

        from .spmv_pallas import supports

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        return jax.default_backend() == "tpu" and supports(self.offsets)

    def mv(self, v):
        if self._use_pallas():
            from .spmv_pallas import dia_spmv

            return dia_spmv(self.offsets, self.data, v)
        y = self.data[0] * _shift(v, self.offsets[0])
        for d in range(1, len(self.offsets)):
            y = y + self.data[d] * _shift(v, self.offsets[d])
        return y

    def mv2(self, v, w):
        if self._use_pallas():
            from .spmv_pallas import dia_spmv2

            return dia_spmv2(self.offsets, self.data, v, w)
        # One pass over `data` for both right-hand sides: stack the two
        # vectors on a trailing axis so each diagonal is read once.
        vw = jnp.stack([v, w], axis=1)  # (n, 2)
        y = self.data[0][:, None] * _shift2(vw, self.offsets[0])
        for d in range(1, len(self.offsets)):
            y = y + self.data[d][:, None] * _shift2(vw, self.offsets[d])
        return y[:, 0], y[:, 1]

    def diagonal(self):
        d = self.offsets.index(0)
        return self.data[d]

    def astype(self, dtype):
        # device-resident output even from numpy-backed data (see
        # DenseOperator.astype)
        return DiaOperator(self.offsets, jnp.asarray(self.data, dtype))

    def todense(self):
        n = self.n
        a = np.zeros((n, n), dtype=np.asarray(self.data).dtype)
        data = np.asarray(self.data)
        for d, off in enumerate(self.offsets):
            idx = np.arange(max(0, -off), min(n, n - off))
            a[idx, idx + off] = data[d, idx]
        return jnp.asarray(a)

    def tocsr(self):
        """scipy CSR view (host, f64) — the sparse direct-solve path for
        the error probes / oracle on large fixtures, where densifying
        would need O(n^2) memory (cf. the reference's sparse solve,
        ``callbacks/error_A_norm.py:36-39``)."""
        import scipy.sparse as sp

        n = self.n
        data = np.asarray(self.data, dtype=np.float64)
        rows, cols, vals = [], [], []
        for d, off in enumerate(self.offsets):
            i = np.arange(max(0, -off), min(n, n - off))
            rows.append(i)
            cols.append(i + off)
            vals.append(data[d, i])
        return sp.csr_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n),
        )

    def tree_flatten(self):
        return (self.data,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])


def _shift2(vw: jnp.ndarray, off: int) -> jnp.ndarray:
    """2-column variant of :func:`_shift` for fused 2-RHS SpMV."""
    if off == 0:
        return vw
    zeros = jnp.zeros((abs(off), vw.shape[1]), dtype=vw.dtype)
    if off > 0:
        return jnp.concatenate([vw[off:], zeros], axis=0)
    return jnp.concatenate([zeros, vw[:off]], axis=0)


@jax.tree_util.register_pytree_node_class
@dataclass
class EllOperator:
    """Padded-ELL operator for general sparse matrices.

    ``val[i, l]`` / ``idx[i, l]`` give the l-th stored entry of row i;
    padding slots carry value 0 and index i (self-referencing, so the
    gather stays in-bounds).  ``nnz_stored`` tracks real nonzeros.
    """

    val: jnp.ndarray  # (n, L)
    idx: jnp.ndarray  # (n, L) int32
    nnz_stored: int = field(default=0)

    @property
    def n(self) -> int:
        return self.val.shape[0]

    @property
    def nnz(self) -> int:
        return self.nnz_stored

    @property
    def dtype(self):
        return self.val.dtype

    def _use_ell_kernel(self) -> bool:
        """EXPERIMENTAL opt-in (NCGV_ELL_KERNEL=1): in-kernel gather with
        the whole vector VMEM-resident (ops/ell_pallas.py).  Off by
        default until a chip run lands a measured win over XLA's gather
        (benchmarks/ell_kernel_check.py probes toolchain support)."""
        import os

        if os.environ.get("NCGV_ELL_KERNEL", "") != "1":
            return False
        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        from .ell_pallas import supports_ell_kernel

        return jax.default_backend() == "tpu" and supports_ell_kernel(self.n)

    def mv(self, v):
        if self._use_ell_kernel():
            from .ell_pallas import ell_spmv

            return ell_spmv(self.val, self.idx, v)
        return jnp.sum(self.val * v[self.idx], axis=1)

    def mv2(self, v, w):
        if self._use_ell_kernel():
            from .ell_pallas import ell_spmv

            return ell_spmv(self.val, self.idx, v), ell_spmv(
                self.val, self.idx, w)
        g = jnp.stack([v, w], axis=1)[self.idx]  # (n, L, 2)
        out = jnp.sum(self.val[:, :, None] * g, axis=1)
        return out[:, 0], out[:, 1]

    def diagonal(self):
        n = self.val.shape[0]
        rows = jnp.arange(n)[:, None]
        hit = self.idx == rows
        return jnp.sum(jnp.where(hit, self.val, 0.0), axis=1)

    def astype(self, dtype):
        # val AND idx device-resident (see DenseOperator.astype)
        return EllOperator(
            jnp.asarray(self.val, dtype), jnp.asarray(self.idx), self.nnz_stored
        )

    def todense(self):
        n, L = self.val.shape
        a = np.zeros((n, n), dtype=np.asarray(self.val).dtype)
        val = np.asarray(self.val)
        idx = np.asarray(self.idx)
        for l in range(L):
            np.add.at(a, (np.arange(n), idx[:, l]), val[:, l])
        return jnp.asarray(a)

    def tocsr(self):
        import scipy.sparse as sp

        n, L = self.val.shape
        val = np.asarray(self.val, dtype=np.float64).ravel()
        col = np.asarray(self.idx).ravel()
        row = np.repeat(np.arange(n), L)
        # padding slots carry value 0 (index i): summed duplicates are a
        # no-op, and csr drops nothing — structure stays exact
        return sp.csr_matrix((val, (row, col)), shape=(n, n))

    def tree_flatten(self):
        return (self.val, self.idx), self.nnz_stored

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def build_dense(coo) -> np.ndarray:
    """Host-side f64 dense array from COO (duplicates summed)."""
    n = coo.shape[0]
    a = np.zeros((n, n), dtype=np.float64)
    np.add.at(a, (np.asarray(coo.row), np.asarray(coo.col)),
              np.asarray(coo.val, dtype=np.float64))
    return a


def build_dia(coo) -> tuple:
    """Host-side f64 DIA layout ``(offsets, data)`` from COO."""
    n = coo.shape[0]
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    val = np.asarray(coo.val, dtype=np.float64)
    diags = np.unique(col - row)
    offsets = tuple(int(o) for o in diags)
    data = np.zeros((len(offsets), n), dtype=np.float64)
    omap = {o: d for d, o in enumerate(offsets)}
    d_idx = np.array([omap[int(o)] for o in (col - row)])
    np.add.at(data, (d_idx, row), val)
    return offsets, data


def build_sym_dia(coo) -> tuple:
    """Host-side f64 symmetric half-band layout ``(offsets, data)``.

    Stores main + upper diagonals only (``offsets >= 0``, 0 first);
    ``data[d, i] = A[i, i + offsets[d]]`` with explicit zeros past the
    matrix edge.  The caller is responsible for the symmetry check
    (:func:`choose_format` / ``fmt='symdia'`` callers) — the lower
    triangle's values are DROPPED here, which is only lossless for
    exactly symmetric input.
    """
    n = coo.shape[0]
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    val = np.asarray(coo.val, dtype=np.float64)
    upper = col >= row
    offs = (col - row)[upper]
    uoffs = np.unique(offs)
    offsets = (0,) + tuple(int(o) for o in uoffs if o != 0)
    data = np.zeros((len(offsets), n), dtype=np.float64)
    omap = {o: d for d, o in enumerate(offsets)}
    d_idx = np.array([omap[int(o)] for o in offs])
    np.add.at(data, (d_idx, row[upper]), val[upper])
    return offsets, data


def build_ell(coo) -> tuple:
    """Host-side f64 padded-ELL layout ``(val, idx, nnz)`` from COO."""
    n = coo.shape[0]
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    val = np.asarray(coo.val, dtype=np.float64)
    counts = np.bincount(row, minlength=n)
    L = max(1, int(counts.max()))
    order = np.lexsort((col, row))
    try:
        from ..matio import _native

        ell_val, ell_idx = _native.pack_ell(
            row[order], col[order], val[order], n, L
        )
    except Exception:
        ell_val = np.zeros((n, L), dtype=np.float64)
        ell_idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, L))
        slot = np.zeros(n, dtype=np.int64)
        for e in order:
            i = row[e]
            ell_val[i, slot[i]] += val[e]
            ell_idx[i, slot[i]] = col[e]
            slot[i] += 1
    return ell_val, ell_idx, int(len(val))


#: auto-routing memory budget for the block-banded packing: padded
#: values stored (3*bs*n_pad), denominated in F32 VALUES (scaled by the
#: build dtype's itemsize).  512M f32 values = 2 GB — comfortably inside
#: one v5e HBM next to the solver vectors.
_BLOCK_BANDED_MAX_PADDED = 512_000_000

#: half-band limit for the symmetric half-band auto route — the Pallas
#: mirror-spill kernel's (lane rotate + one sublane carry) decomposition
#: covers shifts < one 128-lane row (``ops/sym_dia.py``)
_SYMDIA_MAX_HALF_BAND = 128


def _is_symmetric(coo) -> bool:
    """Exact (bitwise) numerical symmetry check, O(nnz) host-side.

    CG targets SPD systems, and every symmetric ``.mtx`` fixture expands
    both triangles from the same stored values, so exact equality is the
    right test (no tolerance = no false routing of near-symmetric input).
    """
    c = coo.tocsr()
    c.sum_duplicates()
    d = c - c.T.tocsr()
    return d.nnz == 0 or float(np.abs(d.data).max()) == 0.0


def _stencil_probe(coo):
    """``(diag, off_value, k)`` when the matrix is diag + constant hollow
    band at ``|i-j| < k`` (the PETSc model-problem structure,
    ``ex2a.c:86-90``), else ``None``.  Exact-equality probe per diagonal.
    """
    n = coo.shape[0]
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    val = np.asarray(coo.val, dtype=np.float64)
    offs = col - row
    uoffs = np.unique(offs)
    nonzero_offs = uoffs[uoffs != 0]
    if len(nonzero_offs) == 0:
        return None  # pure diagonal: DIA already optimal (one stream)
    # contiguous symmetric band 1..k-1 on both sides
    k = int(nonzero_offs.max()) + 1
    want = np.concatenate([np.arange(-(k - 1), 0), np.arange(1, k)])
    if len(nonzero_offs) != len(want) or not np.array_equal(
        np.sort(nonzero_offs), want
    ):
        return None
    off_mask = offs != 0
    off_vals = val[off_mask]
    c = off_vals[0]
    if not (off_vals == c).all() or c == 0.0:
        return None
    # every off-diagonal must be FULL (missing entries are implicit
    # zeros that break constancy)
    counts = np.bincount(np.abs(offs[off_mask]), minlength=k)
    expected = 2 * (n - np.arange(k))
    if not np.array_equal(counts[1:k], expected[1:k]):
        return None
    if 0 not in uoffs:
        return None
    diag = np.zeros(n, dtype=np.float64)
    np.add.at(diag, row[~off_mask], val[~off_mask])
    return diag, float(c), k


def choose_format(coo, dia_max_diags: int = 256,
                  max_padded_values: int = _BLOCK_BANDED_MAX_PADDED,
                  dtype=None) -> str:
    """The auto policy (VERDICT r3 task 6; extended r5 with the
    measured-fastest formulations).

    dense for small n; then, for banded patterns, the two formats that
    measured fastest on chip (PERF.md): **stencil** when the off-band is
    one constant (matrix-free window-sum matvec, no matrix traffic) and
    **symdia** (symmetric half-band storage, half the matrix traffic)
    when the matrix is exactly symmetric with half-band < 128; then DIA
    for low occupied-diagonal count; for general patterns an RCM
    bandwidth probe routes to the **block-banded MXU formulation**
    whenever the packed band fits the memory budget (bcsstk18-class
    fixtures: ~30x faster per iteration than the gather, PERF.md); only
    band-irreducible large matrices fall back to gather-ELL — with a
    loud warning, because XLA's gather sustains only ~40M elem/s on TPU
    (latency-class, ``benchmarks/ell_results.json``).

    ``max_padded_values`` is denominated in f32 values; pass ``dtype``
    to scale the block-banded admission by the build itemsize (an f64
    build stores 2x the bytes per padded value).
    """
    n = coo.shape[0]
    if n <= 512:
        return "dense"
    diags = np.unique(np.asarray(coo.col) - np.asarray(coo.row))
    if len(diags) <= dia_max_diags:
        half_band = int(np.abs(diags).max()) if len(diags) else 0
        if 0 < half_band < _SYMDIA_MAX_HALF_BAND and _is_symmetric(coo):
            if _stencil_probe(coo) is not None:
                return "stencil"
            return "symdia"
        return "dia"
    from .block_banded import rcm_band_probe

    bw = rcm_band_probe(coo)
    bs = max(128, -(-max(bw, 1) // 128) * 128)
    n_pad = -(-n // bs) * bs
    itemsize = np.dtype(dtype).itemsize if dtype is not None else 4
    if 3 * bs * n_pad * itemsize <= max_padded_values * 4:
        return "block_banded"
    import warnings

    warnings.warn(
        f"matrix (n={n}, nnz={len(coo.val)}) is not bandwidth-reducible "
        f"(RCM band {bw}); falling back to the gather-ELL formulation, "
        "which is latency-bound on TPU (~40M gathered elements/s). "
        "Expect orders-of-magnitude lower SpMV throughput than the "
        "block-banded/DIA paths; consider a coarser partitioning or "
        "fmt='ell' with small row counts per dispatch.",
        stacklevel=3,
    )
    return "ell"


def from_coo(coo, fmt: str = "auto", dtype=jnp.float64, dia_max_diags: int = 256):
    """Build an operator from a :class:`~..matio.matrix_market.CooMatrix`.

    ``fmt``: ``'dense' | 'dia' | 'symdia' | 'stencil' | 'ell' |
    'block_banded' | 'auto'``.  Auto picks dense for small matrices,
    then the measured-fastest applicable banded formulation (stencil >
    symdia > DIA), the RCM-reordered block-banded MXU packing when the
    band is affordable, else ELL (see :func:`choose_format`).
    """
    if fmt == "auto":
        fmt = choose_format(coo, dia_max_diags, dtype=dtype)

    if fmt == "symdia":
        from .sym_dia import SymDiaOperator

        offsets, data = build_sym_dia(coo)
        return SymDiaOperator(offsets, jnp.asarray(data, dtype=dtype))

    if fmt == "stencil":
        from .stencil import BandedStencilOperator

        probe = _stencil_probe(coo)
        if probe is None:
            raise ValueError(
                "matrix is not diag + constant hollow band; "
                "fmt='stencil' does not apply"
            )
        diag, off_value, k = probe
        return BandedStencilOperator(
            jnp.asarray(diag, dtype=dtype),
            jnp.asarray(off_value, dtype=dtype), k,
        )

    if fmt == "block_banded":
        from .block_banded import PermutedBlockBandedOperator, block_banded_from_coo

        op, perm = block_banded_from_coo(coo, dtype=dtype)
        return PermutedBlockBandedOperator(op, jnp.asarray(perm, jnp.int32))

    if fmt == "dense":
        return DenseOperator(jnp.asarray(build_dense(coo), dtype=dtype))

    if fmt == "dia":
        offsets, data = build_dia(coo)
        return DiaOperator(offsets, jnp.asarray(data, dtype=dtype))

    if fmt == "ell":
        ell_val, ell_idx, nnz = build_ell(coo)
        return EllOperator(
            jnp.asarray(ell_val, dtype=dtype), jnp.asarray(ell_idx), nnz
        )

    raise ValueError(f"unknown format {fmt!r}")


def as_operator(a, dtype=None):
    """Coerce an array / operator / CooMatrix / scipy matrix into an
    operator.

    Anything exposing the operator protocol (``mv``/``mv2``/``diagonal``)
    passes through — e.g. :class:`~.stencil.BandedStencilOperator` or a
    user-defined matrix-free operator.  scipy sparse matrices (the
    reference solvers' native input type, ``cg_variants/hs_cg.py:9``)
    are accepted directly and routed by the auto format policy.
    """
    from ..matio.matrix_market import CooMatrix

    if hasattr(a, "mv") and hasattr(a, "diagonal"):
        return a if dtype is None else a.astype(dtype)
    if hasattr(a, "tocoo") and not isinstance(a, np.ndarray):  # scipy sparse
        a = coo_from_scipy(a)
    if isinstance(a, CooMatrix):
        return from_coo(a, dtype=dtype or jnp.float64)
    arr = jnp.asarray(a, dtype=dtype)
    return DenseOperator(arr)


def coo_from_scipy(a):
    """scipy sparse (any format) -> :class:`~..matio.matrix_market.CooMatrix`."""
    from ..matio.matrix_market import CooMatrix

    c = a.tocoo()
    return CooMatrix(
        shape=tuple(c.shape),
        row=np.asarray(c.row, dtype=np.int64),
        col=np.asarray(c.col, dtype=np.int64),
        val=np.asarray(c.data, dtype=np.float64),
    )
