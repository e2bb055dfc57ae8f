"""Constant-band stencil operator: the model-problem fast path.

Both reference scaling experiments use operators whose off-diagonal
entries are a single constant: the PETSc k-banded model has
``off_value`` on every in-band off-diagonal (``ex2a.c:86-90``) and the
mpi4py model is purely diagonal.  SURVEY §7 ("hard parts") calls for a
stencil/DIA fast path for exactly these.  For a constant band,

    y_i = d_i v_i + c * (sum_{|i-j|<k, j != i} v_j)
        = (d_i - c) v_i + c * W_i,

where ``W_i`` is the width-(2k-1) moving-window sum of v — computable in
O(n) with prefix sums instead of O(k n), and with NO matrix storage: the
operator's HBM traffic is a handful of vectors instead of the (ndiags, n)
data array, turning the banded SpMV from data-bandwidth-bound into
vector-bandwidth-bound (~ndiags x less traffic).

Numerical note: a single long prefix sum accumulates O(n) rounding error
that is catastrophic when differencing nearby prefix values in f32, so
the window sum uses a two-level scheme (intra-block prefix + block-total
prefix, block = 256) bounding the error at O(B + n/B) ulps.  Parity
tests pin the f64 path against :class:`~.operators.DiaOperator`; f32
accuracy studies should still use the DIA operator.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandedStencilOperator", "window_sum"]

_BLOCK = 256


def window_sum(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """W_i = sum_{j: |i-j| < k} v_j via two-level prefix sums.

    Out-of-range positions contribute zero (matrix boundary).
    """
    if k <= 1:
        return v
    n = v.shape[0]
    h = k - 1
    pad = (-n) % _BLOCK
    vp = jnp.pad(v, (0, pad))
    blocks = vp.reshape(-1, _BLOCK)
    # intra-block inclusive prefix + exclusive block-total prefix
    intra = jnp.cumsum(blocks, axis=1)
    totals = intra[:, -1]
    block_prefix = jnp.concatenate(
        [jnp.zeros((1,), v.dtype), jnp.cumsum(totals)[:-1]]
    )
    # inclusive global prefix s[i] = sum(v[:i+1]), then shift to exclusive
    incl = (intra + block_prefix[:, None]).reshape(-1)[:n]
    s = jnp.concatenate([jnp.zeros((1,), v.dtype), incl])  # s[j] = sum(v[:j])
    # W_i = s[min(i+k, n)] - s[max(i-h, 0)]
    upper = jnp.concatenate([s[k:], jnp.full((min(k, n),), s[n], v.dtype)])[:n]
    lower = jnp.concatenate([jnp.zeros((min(h, n),), v.dtype), s[: n - h]])[:n] if h < n else jnp.zeros((n,), v.dtype)
    return upper - lower


@jax.tree_util.register_pytree_node_class
@dataclass
class BandedStencilOperator:
    """A = diag(d) + c * (band ones of half-width k, hollow).

    ``k`` is the PETSc driver's half-bandwidth (entries at |i-j| < k);
    matches :func:`~..matio.problems.banded_model` with ``fmt='stencil'``.
    """

    diag: jnp.ndarray
    off_value: jnp.ndarray  # scalar
    k: int  # static

    @property
    def n(self) -> int:
        return self.diag.shape[0]

    @property
    def nnz(self) -> int:
        n, k = self.n, self.k
        return int(n + 2 * sum(max(n - o, 0) for o in range(1, k)))

    @property
    def dtype(self):
        return self.diag.dtype

    def mv(self, v):
        w = window_sum(v, self.k)
        return (self.diag - self.off_value) * v + self.off_value * w

    def mv2(self, v, w_vec):
        return self.mv(v), self.mv(w_vec)

    def diagonal(self):
        return self.diag

    def astype(self, dtype):
        # device-resident output even from numpy-backed leaves (see
        # operators.DenseOperator.astype)
        return BandedStencilOperator(
            jnp.asarray(self.diag, dtype), jnp.asarray(self.off_value, dtype),
            self.k
        )

    def todense(self):
        n, k = self.n, self.k
        a = np.full((n, n), 0.0)
        off = float(self.off_value)
        for o in range(1, k):
            idx = np.arange(n - o)
            a[idx, idx + o] = off
            a[idx + o, idx] = off
        a[np.arange(n), np.arange(n)] = np.asarray(self.diag)
        return jnp.asarray(a)

    def tocsr(self):
        import scipy.sparse as sp

        n, k = self.n, self.k
        off = float(self.off_value)
        diags = [np.asarray(self.diag, dtype=np.float64)]
        offsets = [0]
        for o in range(1, k):
            band = np.full(n - o, off)
            diags += [band, band]
            offsets += [o, -o]
        return sp.diags(diags, offsets, shape=(n, n), format="csr")

    def tree_flatten(self):
        return (self.diag, self.off_value), self.k

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)
