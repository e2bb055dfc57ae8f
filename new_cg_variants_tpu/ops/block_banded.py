"""Block-banded operator: the MXU path for general sparse matrices.

XLA's general gather on TPU runs ~40M elements/s (scalar-unit bound —
measured on bcsstk18, benchmarks/ell_results.json), so the padded-ELL
gather formulation is latency-class, not bandwidth-class.  The reference
side-steps this with CSR on CPUs (``numerical_experiments/exact_cg.py``
and PETSc ``mpiaij``); the TPU-native answer is to *restructure*:

1. Reorder the matrix to minimize bandwidth (reverse Cuthill-McKee on
   host, or keep the natural order when it's already tighter).
2. Pack the band into block-tridiagonal form: blocks of size
   ``bs >= bandwidth`` (rounded to the 128-lane grain), so row block i
   couples only to blocks i-1, i, i+1.
3. SpMV becomes a *batched dense matmul* ``(nb, bs, 3bs) @ (nb, 3bs, k)``
   — the MXU's native shape, fully tiled, zero gathers.

Density cost: the packed blocks store ``3 * bs * n`` values regardless
of nnz.  For bandwidth-reducible matrices (every bcsstk/nos/s3* fixture
class) that's a 20-100x throughput win over the gather formulation; for
matrices whose RCM band stays O(n) the ELL path remains the fallback.

The returned system is the REORDERED one (``P A P^T``): solve
``(PAP^T) y = P b`` and un-permute ``x = P^T y`` — one O(n) host
permutation each way, outside the iteration loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BlockBandedOperator",
    "block_banded_from_coo",
    "PermutedBlockBandedOperator",
    "rcm_band_probe",
    "solver_basis",
]


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockBandedOperator:
    """Block-tridiagonal packed band; SpMV = batched MXU matmul.

    ``a_blk[i]`` is the ``(bs, 3*bs)`` dense coupling of row block i to
    ``[x_{i-1} | x_i | x_{i+1}]`` (zero blocks at the ends).  ``n_orig``
    is the true dimension (rows beyond it are explicit zero padding with
    unit diagonal so CG iterates on them stay exactly zero).
    """

    a_blk: jnp.ndarray  # (nb, bs, 3*bs)
    n_orig: int
    nnz_stored: int

    @property
    def bs(self) -> int:
        return self.a_blk.shape[1]

    @property
    def n(self) -> int:
        return self.a_blk.shape[0] * self.a_blk.shape[1]

    @property
    def nnz(self) -> int:
        return self.nnz_stored

    @property
    def dtype(self):
        return self.a_blk.dtype

    def _windows(self, v):
        """(nb, 3*bs[, k]) sliding block windows of v, zero-padded ends."""
        nb, bs = self.a_blk.shape[0], self.bs
        tail = v.shape[1:]
        vp = jnp.concatenate(
            [jnp.zeros((bs,) + tail, v.dtype), v,
             jnp.zeros((bs,) + tail, v.dtype)]
        ).reshape((nb + 2, bs) + tail)
        return jnp.concatenate([vp[:-2], vp[1:-1], vp[2:]], axis=1)

    def mv(self, v):
        win = self._windows(v)  # (nb, 3bs)
        y = jnp.einsum("nij,nj->ni", self.a_blk, win,
                       preferred_element_type=v.dtype)
        return y.reshape(-1)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # (n, 2)
        win = self._windows(vw)  # (nb, 3bs, 2) — ONE pass over the blocks
        y = jnp.einsum("nij,njk->nik", self.a_blk, win,
                       preferred_element_type=v.dtype)
        y = y.reshape(-1, 2)
        return y[:, 0], y[:, 1]

    def diagonal(self):
        bs = self.bs
        d = self.a_blk[:, :, bs : 2 * bs]  # center blocks
        return jnp.diagonal(d, axis1=1, axis2=2).reshape(-1)

    def astype(self, dtype):
        # device-resident output even from numpy-backed blocks (see
        # operators.DenseOperator.astype)
        return BlockBandedOperator(jnp.asarray(self.a_blk, dtype), self.n_orig,
                                   self.nnz_stored)

    def todense(self):
        nb, bs = self.a_blk.shape[0], self.bs
        n = nb * bs
        a = np.zeros((n + 2 * bs, n), dtype=np.asarray(self.a_blk).dtype)
        blk = np.asarray(self.a_blk)
        for i in range(nb):
            a[i * bs : (i + 1) * bs + 2 * bs, i * bs : (i + 1) * bs] += (
                blk[i].T
            )
        return jnp.asarray(a[bs : bs + n, :][: self.n_orig, : self.n_orig].T)

    def tocsr(self):
        import scipy.sparse as sp

        return sp.csr_matrix(np.asarray(self.todense(), dtype=np.float64))

    def tree_flatten(self):
        return (self.a_blk,), (self.n_orig, self.nnz_stored)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class PermutedBlockBandedOperator:
    """Presents a reordered block-banded operator in ORIGINAL coordinates.

    ``inner`` represents ``P A P^T`` (padded); ``perm`` is the
    original->reordered row map.  ``mv`` costs two O(n) permutation
    gathers around the inner MXU matmul — negligible against the block
    work — so a general sparse matrix routed here by
    :func:`~.operators.from_coo` ``fmt='auto'`` behaves exactly like any
    other operator (same b, same x) while running ~30x faster than the
    gather-ELL formulation (PERF.md, bcsstk18).  The PETSc analog is
    ``mpiaij`` accepting arbitrary patterns (``cg_impls/pipeprcg.c:162``);
    the TPU answer restructures instead of gathering.
    """

    inner: BlockBandedOperator
    perm: jnp.ndarray  # (n_orig,) int32

    @property
    def n(self) -> int:
        return self.inner.n_orig

    @property
    def nnz(self) -> int:
        return self.inner.nnz

    @property
    def dtype(self):
        return self.inner.dtype

    def _permute_in(self, v):
        vp = jnp.zeros((self.inner.n,) + v.shape[1:], v.dtype)
        return vp.at[: self.n].set(v[self.perm])

    def _permute_out(self, w):
        out = jnp.zeros((self.n,) + w.shape[1:], w.dtype)
        return out.at[self.perm].set(w[: self.n])

    def mv(self, v):
        return self._permute_out(self.inner.mv(self._permute_in(v)))

    def mv2(self, v, w):
        y, z = self.inner.mv2(self._permute_in(v), self._permute_in(w))
        return self._permute_out(y), self._permute_out(z)

    def diagonal(self):
        return self._permute_out(self.inner.diagonal())

    def astype(self, dtype):
        return PermutedBlockBandedOperator(self.inner.astype(dtype), self.perm)

    def tocsr(self):
        import scipy.sparse as sp

        csr = self.inner.tocsr()[: self.n, : self.n]
        inv = np.empty(self.n, dtype=np.int64)
        inv[np.asarray(self.perm)] = np.arange(self.n)
        # inner = A[perm][:, perm]; invert both axes to recover A
        return sp.csr_matrix(csr[inv][:, inv])

    def todense(self):
        return jnp.asarray(self.tocsr().toarray())

    def tree_flatten(self):
        return (self.inner, self.perm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def solver_basis(op):
    """Hoist a :class:`PermutedBlockBandedOperator`'s permutation OUT of
    the iteration loop.

    Returns ``(inner_op, to_basis, from_basis)``: solve
    ``inner_op @ y = to_basis(b)`` and recover ``x = from_basis(y)``.
    Per-matvec permutation gathers run at the TPU gather rate (~40M
    elem/s) and dominate small problems (bcsstk18: 0.34 ms/iter through
    the wrapper vs 0.04 on the raw block-banded operator —
    ``benchmarks/ell_results.json``); two O(n) permutations per SOLVE
    are free.  The solver entry points (``run``/``solve``/benchmark
    harnesses) apply this automatically; iteration norms are
    permutation-invariant, and pad rows carry a unit diagonal with zero
    rhs so their iterates stay exactly zero.  For non-wrapped operators
    this is the identity.
    """
    if not isinstance(op, PermutedBlockBandedOperator):
        ident = lambda v: v  # noqa: E731
        return op, ident, ident
    inner, perm, n = op.inner, op.perm, op.n

    def to_basis(v):
        v = jnp.asarray(v)
        vp = jnp.zeros((inner.n,) + v.shape[1:], v.dtype)
        return vp.at[:n].set(v[perm])

    def from_basis(w):
        w = jnp.asarray(w)
        out = jnp.zeros((n,) + w.shape[1:], w.dtype)
        return out.at[perm].set(w[:n])

    return inner, to_basis, from_basis


def rcm_band_probe(coo) -> int:
    """Bandwidth of the matrix after the better of {natural, RCM} order.

    The probe's full result (both bandwidths + the RCM permutation) is
    memoized on the COO object so :func:`block_banded_from_coo` on the
    same matrix skips recomputing the RCM and the permuted pattern —
    ``choose_format`` + the subsequent build used to do the O(nnz)
    reorder twice.
    """
    return _rcm_probe_full(coo)[0]


def _rcm_probe_full(coo):
    """``(min_bw, bw_natural, bw_rcm, rcm_perm)``, memoized on ``coo``."""
    cached = getattr(coo, "_rcm_probe_cache", None)
    if cached is not None:
        return cached
    csr = coo.tocsr()
    row = np.asarray(coo.row)
    col = np.asarray(coo.col)
    bw = int(np.abs(row - col).max()) if len(row) else 0
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    p = np.asarray(reverse_cuthill_mckee(csr, symmetric_mode=True))
    a2 = csr[p][:, p].tocoo()
    bw_rcm = int(np.abs(a2.row - a2.col).max()) if a2.nnz else 0
    result = (min(bw, bw_rcm), bw, bw_rcm, p)
    try:
        coo._rcm_probe_cache = result
    except Exception:
        pass  # attribute-less containers just skip the memo
    return result


def block_banded_from_coo(coo, dtype=jnp.float32, reorder="auto"):
    """Pack a COO matrix into block-banded form; returns ``(op, perm)``.

    ``reorder='auto'`` picks whichever of {natural, RCM} order has the
    smaller bandwidth; ``'rcm'`` forces RCM, ``None`` keeps natural.
    ``perm`` maps original -> reordered: the operator represents
    ``A[perm][:, perm]``; pad rows carry a unit diagonal.
    """
    csr = coo.tocsr()
    n = csr.shape[0]
    row0 = np.asarray(coo.row)
    col0 = np.asarray(coo.col)
    bw_nat = int(np.abs(row0 - col0).max()) if len(row0) else 0

    perm = np.arange(n)
    row, col, val = row0, col0, np.asarray(coo.val, dtype=np.float64)
    if reorder in ("auto", "rcm"):
        # reuse the choose_format probe's memoized RCM when available
        _, _, bw_rcm, p = _rcm_probe_full(coo)
        if reorder == "rcm" or bw_rcm < bw_nat:
            a2 = csr[p][:, p].tocoo()
            perm, row, col, val = p, a2.row, a2.col, a2.data
            bw_nat = bw_rcm

    bs = _round_up(max(bw_nat, 1), 128)
    n_pad = _round_up(n, bs)
    nb = n_pad // bs

    a_blk = np.zeros((nb, bs, 3 * bs), dtype=np.float64)
    bi = row // bs
    ri = row % bs
    # column position within the window [x_{bi-1} | x_bi | x_{bi+1}]
    ci = col - (bi - 1) * bs
    assert (ci >= 0).all() and (ci < 3 * bs).all(), "bandwidth exceeds bs"
    np.add.at(a_blk, (bi, ri, ci), val)
    # unit diagonal on pad rows: keeps the padded system SPD and pad
    # iterates exactly zero (b is zero there)
    for i in range(n, n_pad):
        a_blk[i // bs, i % bs, bs + i % bs] = 1.0

    op = BlockBandedOperator(jnp.asarray(a_blk, dtype=dtype), n,
                             int(len(val)))
    return op, perm
