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
  :class:`ColShardContext`.  Its default ``packed=True`` mode is the
  reference's *single-collective* structure: the matvec GEMM partials
  and the sync phase's scalar partials ride ONE ``psum`` buffer
  (``cg_variants/gv_cg.py:29-38``, ``pipe_pr_cg.py:24-45`` pack
  ``t|nu|eta`` resp. ``[w'|u]|mu,delta,gamma,nu`` into one
  ``Allreduce``), so gv/pipe-PR cost exactly one collective latency per
  iteration.  ``packed=False`` switches the matvec combine to
  ``psum_scatter`` (reduce-scatter: half the traffic, each device keeps
  only its slice) at the price of a second, scalar-only collective.
* **Reduction fusion via buffer packing** (one ``Allreduce`` carrying
  all scalars, ``cg_variants/pipe_pr_cg.py:31-45``) → ``dots`` stacks
  all local partials of a sync phase into one small vector and issues a
  SINGLE ``lax.psum``.  Because the step functions form dot partials
  before calling the matvec, the psum and the SpMV have no data
  dependence and XLA's async collectives can overlap them — the
  ``VecDotBegin/PetscCommSplitReductionBegin/VecDotEnd`` split
  (``pipeprcg.c:154-173``) without explicit begin/end calls
  (tests/test_overlap_structure.py pins the independence).

All contexts run *inside* ``shard_map`` over a 1-D mesh axis; the
solver step functions are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "RowShardContext",
    "ColShardContext",
    "EllRowShardContext",
    "BlockBandedRowShardContext",
    "SymDiaRowShardContext",
    "sym_dia_shard_data",
    "DFRowShardContext",
    "StencilRowShardContext",
]


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


class _MeshContext:
    """Shared mesh-context behavior (preconditioner, fused reductions).

    ``mv_dots``/``mv2_dots`` are the matvec+scalar synchronization phase
    of the pipelined families (gv/pipe-*): the default keeps them as two
    independent operations with the dots ISSUED FIRST, so the scalar
    psum can overlap the SpMV (the split-reduction order of
    ``pipeprcg.c:154-173``).  :class:`ColShardContext` overrides them to
    pack everything into one collective (the mpi4py structure).
    """

    precond = None
    compensated = False

    @property
    def has_prec(self) -> bool:
        return self.precond is not None

    def prec(self, v):
        return self.precond.apply(v) if self.precond is not None else v

    def _halo_extend(self, v):
        """[left halo | v | right halo] via two neighbor ppermute hops.

        Non-circular permutes: edge devices receive zeros, which is
        exactly the matrix-boundary condition (no rows outside [0, n)).
        Works on (m,) vectors and (m, c) stacked-word/RHS arrays alike;
        requires ``self.h`` (halo width) and ``self.axis``.
        """
        h = self.h
        if h == 0:
            return v
        p = lax.axis_size(self.axis)
        # halo from the LEFT neighbor: device d sends its last h rows to
        # d+1; halo from the RIGHT: d+1 sends its first h rows to d.
        left = lax.ppermute(v[-h:], self.axis,
                            [(d, d + 1) for d in range(p - 1)])
        right = lax.ppermute(v[:h], self.axis,
                             [(d + 1, d) for d in range(p - 1)])
        return jnp.concatenate([left, v, right], axis=0)

    def dots(self, *pairs):
        return _psum_batch(pairs, self.axis, self.compensated)

    def mv_dots(self, v, pairs):
        """``(A v, dots(pairs))`` as one synchronization phase."""
        d = self.dots(*pairs)
        return self.mv(v), d

    def mv2_dots(self, v, w, pairs):
        """``(A v, A w, dots(pairs))`` as one synchronization phase."""
        d = self.dots(*pairs)
        y, z = self.mv2(v, w)
        return y, z, d

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(sq)


class RowShardContext(_MeshContext):
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

    def _use_pallas(self) -> bool:
        import os

        from ..ops.spmv_pallas import supports

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
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
        import os

        import jax

        if (
            not os.environ.get("NCGV_DISABLE_PALLAS")
            and jax.default_backend() == "tpu"
            and not self.compensated
        ):
            from ..ops.fused_step import fused_pipe_vector_phase

            x2, r2, w2, p2, s2, part = fused_pipe_vector_phase(
                x, r, w, u, p, s, a1, beta
            )
            summed = lax.psum(jnp.stack(part), self.axis)
            return x2, r2, w2, p2, s2, tuple(summed[i] for i in range(4))
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def pipe_vector_phase_prec(self, s_, a1, beta):
        """Preconditioned pipe vector phase: one Pallas pass + ONE psum.

        The fused kernel's 4 local dot partials ride the same single
        packed psum the generic path's ``dots()`` would — the family's
        one-sync invariant is preserved.  Returns ``None`` (generic
        fallback) off-TPU or when the batch must carry extra scalars.
        """
        import os

        import jax

        if (
            os.environ.get("NCGV_DISABLE_PALLAS")
            or jax.default_backend() != "tpu"
            or self.compensated
            or getattr(self, "extra_norm", None) is not None
        ):
            return None
        from ..ops.fused_step import fused_pipe_vector_phase_prec

        x2, r2, w2, rt2, wt2, p2, s2, st2, part = fused_pipe_vector_phase_prec(
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            s_["rt"], s_["st"], s_["wt"], s_["ut"], a1, beta,
        )
        summed = lax.psum(jnp.stack(part), self.axis)
        return x2, r2, w2, rt2, wt2, p2, s2, st2, tuple(
            summed[i] for i in range(4)
        )

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


def sym_dia_shard_data(data, p, h):
    """Per-device EXTENDED half-band slices for :class:`SymDiaRowShardContext`.

    Device d's local solve needs the half-band at rows
    ``[d*m - h, (d+1)*m + h)``: the mirror term at its first rows reads
    ``data[*, i - off]`` from the PREVIOUS device's tail, and the
    discarded-extension formulation (compute rows ``[-h, m+h)`` locally,
    keep ``[0, m)``) also touches the next device's head.  The overlap is
    static, so it is materialized host-side as a stacked
    ``(p, ndiags, m + 2h)`` array sharded on axis 0 — 2h duplicated
    columns per device, negligible against the band itself.
    """
    import numpy as np

    data = np.asarray(data)
    ndiags, n = data.shape
    m = n // p
    padded = np.zeros((ndiags, n + 2 * h), data.dtype)
    padded[:, h : h + n] = data
    out = np.stack([padded[:, d * m : d * m + m + 2 * h] for d in range(p)])
    return out


class SymDiaRowShardContext(_MeshContext):
    """Row-partitioned SYMMETRIC half-band operator on a 1-D mesh axis.

    Distributes :class:`~..ops.sym_dia.SymDiaOperator` — half the matrix
    traffic per device versus the two-triangle DIA row shard.  The local
    matvec runs on an EXTENDED domain: with ``vext`` the ``[left halo |
    v | right halo]`` vector (the same two non-circular ``ppermute``
    hops as :class:`RowShardContext`) and ``local_data`` the matching
    extended half-band slice (:func:`sym_dia_shard_data`), the
    symmetric-mirror formulation evaluated on rows ``[-h, m+h)`` is the
    exact global operator restricted to this shard; rows outside
    ``[0, m)`` are discarded.  The halo cost is identical to the full-DIA
    row shard (the mirror needs the back halo that DIA's lower triangle
    would have read), so the communication structure — and the pinned
    per-iteration collective counts — are unchanged.
    """

    def __init__(self, offsets, local_data, axis, precond=None,
                 compensated=False):
        self.offsets = tuple(offsets)
        self.local_data = local_data  # (ndiags, m + 2h) extended slice
        self.axis = axis
        self.precond = precond
        self.compensated = compensated
        self.h = max(int(o) for o in self.offsets)

    def _use_pallas(self) -> bool:
        import os

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        if os.environ.get("NCGV_SYMDIA_KERNEL", "") == "0":
            return False
        from ..ops.sym_dia import DEFAULT_TILE

        return (jax.default_backend() == "tpu" and 0 < self.h < 128
                and 2 * self.h <= DEFAULT_TILE)

    def _mv_ext_xla(self, vext, ncols=None):
        """Mirror formulation on the extended domain, rows [h, h+m) kept."""
        from ..ops.operators import _shift, _shift2

        data = self.local_data
        h = self.h
        m = data.shape[1] - 2 * h
        sh = _shift if ncols is None else _shift2
        if ncols is not None:
            y = data[0][:, None] * vext
        else:
            y = data[0] * vext
        for d in range(1, len(self.offsets)):
            off = self.offsets[d]
            dd = data[d] if ncols is None else data[d][:, None]
            y = y + dd * sh(vext, off)
            y = y + sh(dd * vext, -off)
        return y[h : h + m]

    def mv(self, v):
        vext = self._halo_extend(v)
        if self._use_pallas():
            from ..ops.sym_dia import sym_dia_spmv

            h = self.h
            m = vext.shape[0] - 2 * h
            y = sym_dia_spmv(self.offsets, self.local_data, vext)
            return y[h : h + m]
        return self._mv_ext_xla(vext)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # one halo exchange for both RHS
        vwext = self._halo_extend(vw)
        if self._use_pallas():
            from ..ops.sym_dia import sym_dia_spmv2

            h = self.h
            m = vwext.shape[0] - 2 * h
            y, z = sym_dia_spmv2(
                self.offsets, self.local_data, vwext[:, 0], vwext[:, 1]
            )
            return y[h : h + m], z[h : h + m]
        y = self._mv_ext_xla(vwext, ncols=2)
        return y[:, 0], y[:, 1]


class EllRowShardContext(_MeshContext):
    """Row-partitioned padded-ELL operator for GENERAL sparse matrices.

    Each device owns an ``(m, L)`` block of rows.  Two exchange modes for
    the off-device vector entries the local gather references:

    * **Index exchange** (default when a plan is given): the PETSc
      ``VecScatter`` analog (``mpiaij`` MatMult inside
      ``cg_impls/pipeprcg.c:162-170``).  ``local_idx`` is pre-remapped
      into cache coordinates and ``send_idx``/``shifts`` come from
      :func:`~.ell_exchange.plan_ell_exchange`; the exchange is one
      circular ``lax.ppermute`` per active ring hop, traffic
      O(interface) per device instead of O(n).
    * **All-gather fallback** (no plan): the vector is gathered whole —
      correct for arbitrary sparsity, O(n) traffic; chosen automatically
      when the planner finds the padded hop traffic would exceed it.

    Banded/DIA operators should use :class:`RowShardContext` instead.
    """

    def __init__(self, local_val, local_idx, axis, precond=None,
                 compensated=False, shifts=(), send_idx=()):
        self.local_val = local_val
        self.local_idx = local_idx
        self.axis = axis
        self.precond = precond
        self.compensated = compensated
        self.shifts = tuple(shifts)
        self.send_idx = tuple(send_idx)

    def _cache(self, v):
        """[own slice | hop payloads] — the local gather target.

        One circular ppermute per active hop; every device sends its
        padded request list for that hop, receivers never read pad slots
        (the remapped indices only point at real entries).
        """
        if not self.shifts:
            return lax.all_gather(v, self.axis, tiled=True)
        p = lax.axis_size(self.axis)
        parts = [v]
        for s, sidx in zip(self.shifts, self.send_idx):
            perm = [(o, (o + s) % p) for o in range(p)]
            parts.append(lax.ppermute(v[sidx], self.axis, perm))
        return jnp.concatenate(parts, axis=0)

    def mv(self, v):
        cache = self._cache(v)
        return jnp.sum(self.local_val * cache[self.local_idx], axis=1)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # ONE exchange for both RHS
        cache = self._cache(vw)  # (m + recv, 2) or (n, 2)
        g = cache[self.local_idx]  # (m, L, 2)
        out = jnp.sum(self.local_val[:, :, None] * g, axis=1)
        return out[:, 0], out[:, 1]


class BlockBandedRowShardContext(_MeshContext):
    """Row-partitioned block-banded (MXU-path) operator on a mesh axis.

    Distributes :class:`~..ops.block_banded.BlockBandedOperator` — the
    framework's general-sparse answer (RCM reorder + block-tridiagonal
    packing, SpMV = batched MXU matmul) — the way PETSc distributes its
    general ``mpiaij`` matrices under the overlapped hot loop
    (``cg_impls/pipeprcg.c:162-170``): each device owns a contiguous
    range of BLOCK rows (``local_blk`` of shape ``(nb_local, bs, 3*bs)``)
    and the matching ``(nb_local * bs,)`` slice of every vector.  The
    block-tridiagonal coupling means the SpMV halo is exactly ONE
    bs-wide block from each neighbor — two non-circular ``ppermute``
    hops over the ICI ring, O(bs) traffic per device independent of n.
    """

    def __init__(self, local_blk, axis, precond=None, compensated=False):
        self.local_blk = local_blk  # (nb_local, bs, 3*bs)
        self.axis = axis
        self.precond = precond
        self.compensated = compensated

    @property
    def bs(self) -> int:
        return self.local_blk.shape[1]

    def _halo_extend(self, v):
        """[left block | v | right block]; edges get zeros (= the
        operator's zero end-blocks)."""
        bs = self.bs
        p = lax.axis_size(self.axis)
        left = lax.ppermute(v[-bs:], self.axis,
                            [(d, d + 1) for d in range(p - 1)])
        right = lax.ppermute(v[:bs], self.axis,
                             [(d + 1, d) for d in range(p - 1)])
        return jnp.concatenate([left, v, right], axis=0)

    def _windows(self, vext):
        """(nb_local, 3*bs[, k]) sliding block windows of the extended v."""
        nb_local, bs = self.local_blk.shape[0], self.bs
        tail = vext.shape[1:]
        vp = vext.reshape((nb_local + 2, bs) + tail)
        return jnp.concatenate([vp[:-2], vp[1:-1], vp[2:]], axis=1)

    def mv(self, v):
        win = self._windows(self._halo_extend(v))
        y = jnp.einsum("nij,nj->ni", self.local_blk, win,
                       preferred_element_type=v.dtype)
        return y.reshape(-1)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # ONE halo exchange for both RHS
        win = self._windows(self._halo_extend(vw))  # (nb_local, 3bs, 2)
        y = jnp.einsum("nij,njk->nik", self.local_blk, win,
                       preferred_element_type=v.dtype)
        y = y.reshape(-1, 2)
        return y[:, 0], y[:, 1]


class StencilRowShardContext(_MeshContext):
    """Row-partitioned matrix-free constant-band stencil operator.

    Distributes :class:`~..ops.stencil.BandedStencilOperator` — the
    fastest measured formulation for the PETSc model problem (no matrix
    storage at all; PERF.md stencil section).  Each device holds its
    diagonal slice and the scalar ``off_value``; the matvec is the
    window-sum formulation on the halo-extended local vector (halo
    width ``k - 1``, the same two non-circular ppermute hops as every
    row shard), so per-iteration communication stays O(k) per device.
    """

    def __init__(self, local_diag, off_value, k, axis, precond=None,
                 compensated=False):
        self.local_diag = local_diag
        self.off_value = off_value
        self.k = int(k)
        self.axis = axis
        self.precond = precond
        self.compensated = compensated
        self.h = self.k - 1

    def _mv_cols(self, vext):
        """Window-sum matvec on the extended local vector (any ncols)."""
        from ..ops.stencil import window_sum

        h = self.h
        m = self.local_diag.shape[0]
        if vext.ndim == 1:
            w = window_sum(vext, self.k)[h : h + m]
            v = vext[h : h + m]
            return (self.local_diag - self.off_value) * v + self.off_value * w
        outs = []
        for c in range(vext.shape[1]):
            w = window_sum(vext[:, c], self.k)[h : h + m]
            v = vext[h : h + m, c]
            outs.append((self.local_diag - self.off_value) * v
                        + self.off_value * w)
        return jnp.stack(outs, axis=1)

    def mv(self, v):
        return self._mv_cols(self._halo_extend(v))

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # ONE halo exchange for both RHS
        y = self._mv_cols(self._halo_extend(vw))
        return y[:, 0], y[:, 1]


class DFRowShardContext(_MeshContext):
    """Row-partitioned DOUBLE-WORD (f32x2) DIA context: the distributed
    accuracy mode.

    Every distributed experiment in the reference runs in f64 (the
    mpi4py harness solves in float64, ``scaling_tests.py:51-57``; PETSc
    ``PetscScalar`` is double) — and round-3/4 accuracy studies proved
    compensated reductions alone do NOT recover f64-class attainable
    accuracy; the double-word vectors + exact three-word operator do
    (``benchmarks/accuracy_study.json``).  This context carries that
    mode through ``shard_map``:

    * vectors are :class:`~..ops.doublefloat.DF` pairs, sharded on the
      mesh axis leaf-wise; the halo exchange stacks (hi, lo) so both
      words ride ONE ppermute pair per matvec phase;
    * the operator is the exact three-word split, column-sharded like
      the plain-DIA row shard; the local SpMV runs the same EFT
      accumulation as :meth:`~..ops.doublefloat.DFOperator._mv_dia`;
    * ``dots`` computes local double-word partials (Dot2 tree sum) and
      combines them across devices with ONE ``all_gather`` of the
      packed (hi, lo) buffer followed by a deterministic double-word
      tree sum of the P pairs — a ``psum`` would round the high words
      in single precision, losing exactly the bits this mode carries.
      Same collective count per sync phase as the f32 contexts.

    Use under ``solvers.api._df_jit`` (fusion disabled) like every f32x2
    program — the EFT invariant is what makes the mode work.
    """

    is_double_float = True

    def __init__(self, offsets, local_hi, local_lo, local_lo2, axis,
                 precond=None):
        self.offsets = tuple(offsets)
        self.local_hi = local_hi  # (ndiags, m) slices of the word arrays
        self.local_lo = local_lo
        self.local_lo2 = local_lo2
        self.axis = axis
        self.precond = precond
        self.h = max(abs(o) for o in self.offsets)

    def _mv_ext(self, vh, vl):
        """Double-word DIA SpMV on the halo-extended words (local rows)."""
        from ..ops.compensated import df_add, fast_two_sum, two_prod

        m = self.local_hi.shape[1]
        h = self.h
        acc_h = jnp.zeros((m,), vh.dtype)
        acc_l = jnp.zeros((m,), vh.dtype)
        for d, off in enumerate(self.offsets):
            svh = lax.dynamic_slice_in_dim(vh, h + off, m)
            svl = lax.dynamic_slice_in_dim(vl, h + off, m)
            ph, e = two_prod(self.local_hi[d], svh)
            e = e + (self.local_hi[d] * svl + self.local_lo[d] * svh
                     + self.local_lo[d] * svl + self.local_lo2[d] * svh)
            ph, pl = fast_two_sum(ph, e)
            acc_h, acc_l = df_add(acc_h, acc_l, ph, pl)
        from ..ops.doublefloat import DF

        return DF(acc_h, acc_l)

    def mv(self, v):
        vw = jnp.stack([v.hi, v.lo], axis=1)  # both words, ONE exchange
        ext = self._halo_extend(vw)
        return self._mv_ext(ext[:, 0], ext[:, 1])

    def mv2(self, v, w):
        vw = jnp.stack([v.hi, v.lo, w.hi, w.lo], axis=1)  # ONE exchange
        ext = self._halo_extend(vw)
        return (self._mv_ext(ext[:, 0], ext[:, 1]),
                self._mv_ext(ext[:, 2], ext[:, 3]))

    def dots(self, *pairs):
        """One all_gather carrying every (hi, lo) partial of the phase,
        then a deterministic double-word combine of the P pairs."""
        from ..ops.compensated import df_add
        from ..ops.doublefloat import DF, df_dot

        parts = [df_dot(a, b) for (a, b) in pairs]
        k = len(parts)
        buf = jnp.stack([p.hi for p in parts] + [p.lo for p in parts])
        g = lax.all_gather(buf, self.axis)  # (P, 2k)
        hi, lo = g[:, :k], g[:, k:]
        # double-word tree sum over the device axis (P is tiny)
        m = 1
        while m < hi.shape[0]:
            m *= 2
        if m != hi.shape[0]:
            pad = m - hi.shape[0]
            hi = jnp.concatenate([hi, jnp.zeros((pad, k), hi.dtype)])
            lo = jnp.concatenate([lo, jnp.zeros((pad, k), lo.dtype)])
        while m > 1:
            half = m // 2
            hi, lo = df_add(hi[:half], lo[:half], hi[half:], lo[half:])
            m = half
        return tuple(DF(hi[0, i], lo[0, i]) for i in range(k))

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(jnp.abs(sq.value()))


class ColShardContext(_MeshContext):
    """Column-partitioned dense operator (the mpi4py structure).

    ``local_a`` is the device's ``(n, m)`` column block; every vector
    lives as its ``(m,)`` slice.  SpMV = local GEMM partial (MXU) +
    collective combine; ``mv2`` fuses both right-hand sides into one
    ``(m, 2)`` GEMM, the reference's ``np.dot(A, [r|s])`` trick
    (``cg_variants/pipe_pr_cg.py:65``).

    ``packed=True`` (default): the gv/pipe sync phase packs the GEMM
    partials AND the scalar dot partials into ONE ``psum`` buffer —
    exactly one collective latency per iteration, the reference's
    ``(m*size + 2,)`` resp. ``(m*size + 2, 2)`` Allreduce buffers
    (``cg_variants/gv_cg.py:29-38``, ``pipe_pr_cg.py:24-45``).
    ``packed=False``: matvec combine via ``psum_scatter`` (half the
    wire traffic) plus a separate scalar psum — 2 collectives/iter.
    """

    def __init__(self, local_a, axis, precond=None, compensated=False,
                 packed=True):
        self.local_a = local_a
        self.axis = axis
        self.precond = precond
        self.compensated = compensated
        self.packed = packed

    def _local_slice(self, full):
        """This device's (m,)-slice of a combined length-n vector."""
        m = self.local_a.shape[1]
        i = lax.axis_index(self.axis)
        return lax.dynamic_slice_in_dim(full, i * m, m)

    def _scalar_partials(self, pairs):
        """Flat local partial buffer + unpacker for a dots batch."""
        if self.compensated:
            from ..ops.compensated import comp_dot_pair

            vals, errs = zip(*(comp_dot_pair(a, b) for (a, b) in pairs))
            buf = jnp.stack(list(vals) + list(errs))
            k = len(pairs)

            def unpack(summed):
                return tuple(summed[i] + summed[k + i] for i in range(k))

            return buf, unpack
        buf = jnp.stack([jnp.vdot(a, b) for (a, b) in pairs])

        def unpack(summed):
            return tuple(summed[i] for i in range(len(pairs)))

        return buf, unpack

    def mv_dots(self, v, pairs):
        """Packed: matvec partial + scalar partials in ONE psum."""
        if not self.packed:
            return super().mv_dots(v, pairs)
        partial = self.local_a @ v  # (n,)
        scal, unpack = self._scalar_partials(pairs)
        out = lax.psum(jnp.concatenate([partial, scal]), self.axis)
        return self._local_slice(out[: partial.shape[0]]), unpack(
            out[partial.shape[0]:]
        )

    def mv2_dots(self, v, w, pairs):
        if not self.packed:
            return super().mv2_dots(v, w, pairs)
        vw = jnp.stack([v, w], axis=1)  # (m, 2)
        partial = self.local_a @ vw  # (n, 2)
        n = partial.shape[0]
        scal, unpack = self._scalar_partials(pairs)
        out = lax.psum(
            jnp.concatenate([partial.T.reshape(-1), scal]), self.axis
        )
        y = self._local_slice(out[:n])
        z = self._local_slice(out[n: 2 * n])
        return y, z, unpack(out[2 * n:])

    def pipe_full_step(self, s_, a1, beta, recompute):
        """Unpreconditioned pipe-P/PR step with the single packed psum.

        The hook :func:`..solvers.families.make_pipe_step` checks first;
        mirrors the mpi4py ``pipe_pr_cg`` hot loop (``pipe_pr_cg.py:58-83``):
        vector recurrences, then ONE Allreduce carrying the fused 2-RHS
        GEMM partials and the four scalars.
        """
        if not self.packed:
            return None
        x = s_["x"] + a1 * s_["p"]
        r = s_["r"] - a1 * s_["s"]
        w = s_["w"] - a1 * s_["u"]
        p = r + beta * s_["p"]
        s = w + beta * s_["s"]
        pairs = ((p, s), (r, s), (s, s), (r, r))
        if recompute:
            u, w, d = self.mv2_dots(s, r, pairs)
        else:
            u, d = self.mv_dots(s, pairs)
        return x, r, w, p, s, u, d

    def mv(self, v):
        partial = self.local_a @ v  # (n,) partial result
        return lax.psum_scatter(partial, self.axis, scatter_dimension=0, tiled=True)

    def mv2(self, v, w):
        vw = jnp.stack([v, w], axis=1)  # (m, 2)
        partial = self.local_a @ vw  # (n, 2)
        out = lax.psum_scatter(partial, self.axis, scatter_dimension=0, tiled=True)
        return out[:, 0], out[:, 1]
