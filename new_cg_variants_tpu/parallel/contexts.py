"""Mesh execution contexts: the TPU-native communication backend.

The reference's distributed structure (SURVEY §2.9) maps here:

* **Row partition + halo exchange** (PETSc ``mpiaij`` MatMult with
  VecScatter, ``cg_impls/pipeprcg.c:162-170``) →
  :class:`RowShardContext`: each device owns a contiguous block of rows
  of a DIA operator and its slice of every vector; the SpMV gathers a
  halo of width ``h = max|offset|`` from each neighbor with two
  non-circular ``lax.ppermute`` hops over the ICI ring.
* **Column partition + allreduce combine** (mpi4py dense column blocks,
  ``scaling_experiments_mpi4py/scaling_tests.py:51-54``) →
  :class:`ColShardContext`: local GEMM partial + ``psum_scatter``
  (reduce-scatter — strictly less traffic than the reference's full
  ``Allreduce``, each device keeps only its slice).
* **Reduction fusion via buffer packing** (one ``Allreduce`` carrying
  all scalars, ``cg_variants/pipe_pr_cg.py:31-45``) → ``dots`` stacks
  all local partials of a sync phase into one small vector and issues a
  SINGLE ``lax.psum``.  Because the step functions form dot partials
  before calling the matvec, the psum and the SpMV have no data
  dependence and XLA's async collectives can overlap them — the
  ``VecDotBegin/PetscCommSplitReductionBegin/VecDotEnd`` split
  (``pipeprcg.c:154-173``) without explicit begin/end calls.

Both contexts run *inside* ``shard_map`` over a 1-D mesh axis; the
solver step functions are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["RowShardContext", "ColShardContext"]


def _psum_batch(pairs, axis, compensated=False):
    """ONE fused reduction for a batch of inner products.

    With ``compensated`` the packed buffer carries (value, error) pairs
    from the local error-free-transform dots; both components ride the
    same single ``psum`` and are renormalized after the collective.
    """
    if compensated:
        from ..ops.compensated import comp_dot_pair

        vals, errs = zip(*(comp_dot_pair(a, b) for (a, b) in pairs))
        packed = jnp.stack(list(vals) + list(errs))
        summed = lax.psum(packed, axis)
        k = len(pairs)
        return tuple(summed[i] + summed[k + i] for i in range(k))
    partials = jnp.stack([jnp.vdot(a, b) for (a, b) in pairs])
    summed = lax.psum(partials, axis)
    return tuple(summed[i] for i in range(len(pairs)))


class RowShardContext:
    """Row-partitioned DIA operator on a 1-D mesh axis.

    ``local_data`` is the device's ``(ndiags, m)`` slice of the global
    row-indexed DIA array; ``offsets`` static.  Requires halo width
    ``h = max|offset| <= m`` (bandwidth smaller than the shard — true for
    all the scaling model problems).
    """

    def __init__(self, offsets, local_data, axis, precond=None, compensated=False):
        self.offsets = tuple(offsets)
        self.local_data = local_data
        self.axis = axis
        self.precond = precond
        self.compensated = compensated
        self.h = max(abs(o) for o in self.offsets)

    @property
    def has_prec(self) -> bool:
        return self.precond is not None

    def prec(self, v):
        return self.precond.apply(v) if self.precond is not None else v

    def dots(self, *pairs):
        return _psum_batch(pairs, self.axis, self.compensated)

    def _halo_extend(self, v):
        """[left halo | v | right halo] via two neighbor ppermute hops.

        Non-circular permutes: edge devices receive zeros, which is
        exactly the matrix-boundary condition (no rows outside [0, n)).
        """
        h = self.h
        if h == 0:
            return v
        p = lax.axis_size(self.axis)
        # halo from the LEFT neighbor: device d sends its last h rows to d+1.
        # Non-participating edges receive zeros from ppermute — the correct
        # matrix-boundary condition.
        left = lax.ppermute(v[-h:], self.axis, [(d, d + 1) for d in range(p - 1)])
        # halo from the RIGHT neighbor: device d+1 sends its first h rows to d.
        right = lax.ppermute(v[:h], self.axis, [(d + 1, d) for d in range(p - 1)])
        return jnp.concatenate([left, v, right], axis=0)

    def _use_pallas(self) -> bool:
        from ..ops.spmv_pallas import supports

        return jax.default_backend() == "tpu" and supports(self.offsets)

    def _dia_mv(self, vext, ncols=None):
        """y[i] = sum_d data[d, i] * vext[h + i + off_d] on the local rows."""
        m = self.local_data.shape[1]
        h = self.h
        if ncols is None:
            y = self.local_data[0] * lax.dynamic_slice_in_dim(
                vext, h + self.offsets[0], m
            )
            for d in range(1, len(self.offsets)):
                y = y + self.local_data[d] * lax.dynamic_slice_in_dim(
                    vext, h + self.offsets[d], m
                )
            return y
        y = self.local_data[0][:, None] * lax.dynamic_slice_in_dim(
            vext, h + self.offsets[0], m
        )
        for d in range(1, len(self.offsets)):
            y = y + self.local_data[d][:, None] * lax.dynamic_slice_in_dim(
                vext, h + self.offsets[d], m
            )
        return y

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        """Local vector phase + ONE psum — the single sync is preserved:
        the fused kernel's local partials ride the same packed psum the
        generic path's dots() would."""
        import jax

        if jax.default_backend() == "tpu" and not self.compensated:
            from ..ops.fused_step import fused_pipe_vector_phase

            x2, r2, w2, p2, s2, part = fused_pipe_vector_phase(
                x, r, w, u, p, s, a1, beta
            )
            summed = lax.psum(jnp.stack(part), self.axis)
            return x2, r2, w2, p2, s2, tuple(summed[i] for i in range(4))
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def mv(self, v):
        vext = self._halo_extend(v)
        if self._use_pallas():
            from ..ops.spmv_pallas import dia_spmv_ext

            return dia_spmv_ext(self.offsets, self.local_data, vext)
        return self._dia_mv(vext)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # one halo exchange for both RHS
        vwext = self._halo_extend(vw)
        if self._use_pallas():
            from ..ops.spmv_pallas import dia_spmv2_ext

            return dia_spmv2_ext(
                self.offsets, self.local_data, vwext[:, 0], vwext[:, 1]
            )
        y = self._dia_mv(vwext, ncols=2)
        return y[:, 0], y[:, 1]

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(sq)


class EllRowShardContext:
    """Row-partitioned padded-ELL operator for GENERAL sparse matrices.

    Each device owns an ``(m, L)`` block of rows with GLOBAL column
    indices.  Arbitrary sparsity means the needed remote entries are not
    a neighbor halo, so the vector is ``all_gather``-ed before the local
    gather+reduce — the general-matrix fallback SURVEY §7 calls for
    (traffic class of the reference mpi4py ``Allreduce`` combine, but
    rides ICI as an all-gather).  Banded/DIA operators should use
    :class:`RowShardContext` instead.
    """

    def __init__(self, local_val, local_idx, axis, precond=None,
                 compensated=False):
        self.local_val = local_val
        self.local_idx = local_idx
        self.axis = axis
        self.precond = precond
        self.compensated = compensated

    @property
    def has_prec(self) -> bool:
        return self.precond is not None

    def prec(self, v):
        return self.precond.apply(v) if self.precond is not None else v

    def dots(self, *pairs):
        return _psum_batch(pairs, self.axis, self.compensated)

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def mv(self, v):
        v_full = lax.all_gather(v, self.axis, tiled=True)  # (n,)
        return jnp.sum(self.local_val * v_full[self.local_idx], axis=1)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # ONE all_gather for both RHS
        vw_full = lax.all_gather(vw, self.axis, tiled=True)  # (n, 2)
        g = vw_full[self.local_idx]  # (m, L, 2)
        out = jnp.sum(self.local_val[:, :, None] * g, axis=1)
        return out[:, 0], out[:, 1]

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(sq)


class ColShardContext:
    """Column-partitioned dense operator (the mpi4py structure).

    ``local_a`` is the device's ``(n, m)`` column block; every vector
    lives as its ``(m,)`` slice.  SpMV = local GEMM partial (MXU) +
    ``psum_scatter`` combine; ``mv2`` fuses both right-hand sides into
    one ``(m, 2)`` GEMM, the reference's ``np.dot(A, [r|s])`` trick
    (``cg_variants/pipe_pr_cg.py:65``).
    """

    def __init__(self, local_a, axis, precond=None, compensated=False):
        self.local_a = local_a
        self.axis = axis
        self.precond = precond
        self.compensated = compensated

    @property
    def has_prec(self) -> bool:
        return self.precond is not None

    def prec(self, v):
        return self.precond.apply(v) if self.precond is not None else v

    def dots(self, *pairs):
        return _psum_batch(pairs, self.axis, self.compensated)

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def mv(self, v):
        partial = self.local_a @ v  # (n,) partial result
        return lax.psum_scatter(partial, self.axis, scatter_dimension=0, tiled=True)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # (m, 2)
        partial = self.local_a @ vw  # (n, 2)
        out = lax.psum_scatter(partial, self.axis, scatter_dimension=0, tiled=True)
        return out[:, 0], out[:, 1]

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(sq)
