"""Double-word (two-float) arithmetic: the ``dtype="f32x2"`` solve mode.

TPU VPU/MXU arithmetic is f32-native, and the round-3 accuracy study
showed that compensated DOT PRODUCTS alone do not recover the
reference's f64 attainable accuracy — the error floor is set by the
rounding of the *vector recurrences* (AXPYs) and the *SpMV
accumulation*, not the reductions (``benchmarks/accuracy_study.json``).
This module carries every solver vector (and scalar) as an unevaluated
double-float pair ``hi + lo`` (Dekker double-word arithmetic, the
classical f64 substitute on f32 hardware; cf. the float128 "double-
double" construction), giving ~2x24 = 48 significant bits — within
~1.5 decimal digits of IEEE f64 — using only f32 VPU ops that XLA
fuses like any other elementwise graph.

Pieces:

* :class:`DF` — a pytree number type (hi, lo) with operator overloads,
  so the UNMODIFIED family step bodies
  (:mod:`new_cg_variants_tpu.solvers.families`) run in double-word
  arithmetic: ``x = s_["x"] + a1 * s_["p"]`` dispatches to
  :func:`df_add` / :func:`df_mul` through ``__add__``/``__mul__``.
  The reference achieves the same ends by running NumPy in float64
  (``numerical_experiments/figure_gen.py:53-55``); here the precision
  is carried explicitly because the hardware has no f64 path.
* :class:`DFOperator` — an operator whose data is split into hi/lo f32
  parts host-side (no x64 needed on device); ``mv`` accumulates in
  double-word precision (error-free product transforms + compensated
  summation) for the DIA / dense / ELL formats.
* :func:`df_dot` — double-word inner product (Dot2-class accuracy).
* :class:`DoubleFloatContext` — the execution context wiring it into
  the solver engine; built by ``run(..., dtype="f32x2")``.

Single-device only for now (the accuracy experiments are single-chip);
the distributed contexts keep their compensated-psum path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .compensated import _df_tree_sum, df_add, fast_two_sum, two_prod, two_sum

__all__ = [
    "DF",
    "DFOperator",
    "df_split",
    "df_split3",
    "df_dot",
    "df_operator",
    "DoubleFloatContext",
    "collapse",
]


def collapse(v):
    """DF -> ``hi + lo`` in working precision; anything else unchanged.

    The observability boundary: probe rows and convergence norms are
    recorded single-word (their VALUES are f32-representable; the
    double-word carry only matters inside the recurrences).
    """
    return v.hi + v.lo if isinstance(v, DF) else v


def _mul_hi_lo(ah, al, bh, bl):
    """Double-word product of (ah+al) and (bh+bl) -> (hi, lo)."""
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh + al * bl)
    return fast_two_sum(p, e)


def _div_hi_lo(ah, al, bh, bl):
    """Double-word quotient (long division: refine q1 with the df
    residual of a - q1*b)."""
    q1 = ah / bh
    ph, pl = _mul_hi_lo(q1, jnp.zeros_like(q1), bh, bl)
    rh, rl = df_add(ah, al, -ph, -pl)
    q2 = (rh + rl) / bh
    return fast_two_sum(q1, q2)


@jax.tree_util.register_pytree_node_class
@dataclass
class DF:
    """Unevaluated double-float value ``hi + lo`` (array or scalar).

    ``|lo| <= ulp(hi)/2`` after every renormalizing operation.  All
    overloads accept a plain array/scalar on either side (promoted with
    a zero low part), so family step bodies written for plain jnp
    arrays run unchanged.
    """

    hi: jnp.ndarray
    lo: jnp.ndarray

    # -- pytree --
    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- array-protocol bits the solver layer touches --
    @property
    def dtype(self):
        return jnp.asarray(self.hi).dtype

    @property
    def shape(self):
        return jnp.asarray(self.hi).shape

    def value(self):
        """Collapse to working precision (observability/export)."""
        return self.hi + self.lo

    def value64(self):
        """Collapse on host to float64 (keeps both words' information)."""
        return np.asarray(self.hi, np.float64) + np.asarray(self.lo, np.float64)

    # -- arithmetic --
    def _coerce(self, other):
        if isinstance(other, DF):
            return other
        o = jnp.asarray(other, dtype=self.dtype)
        return DF(o, jnp.zeros_like(o))

    def __add__(self, other):
        o = self._coerce(other)
        return DF(*df_add(self.hi, self.lo, o.hi, o.lo))

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, other):
        o = self._coerce(other)
        return DF(*df_add(self.hi, self.lo, -o.hi, -o.lo))

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __mul__(self, other):
        o = self._coerce(other)
        return DF(*_mul_hi_lo(self.hi, self.lo, o.hi, o.lo))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = self._coerce(other)
        return DF(*_div_hi_lo(self.hi, self.lo, o.hi, o.lo))

    def __rtruediv__(self, other):
        return self._coerce(other).__truediv__(self)


def df_split(a, dtype=jnp.float32):
    """Split a host float64 array into a best-approximating DF pair.

    ``hi = f32(a)``, ``lo = f32(a - hi)`` — the standard two-term
    splitting; together they carry ~48 bits of the f64 input.  Device
    arrays / f32 inputs get a zero low part.
    """
    a64 = np.asarray(a, dtype=np.float64)
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))


def df_split3(a, dtype=jnp.float32):
    """Three-word split ``(hi, lo, lo2)``: EXACT for f64 inputs.

    3x24 = 72 bits >= f64's 53-bit significand, so ``hi + lo + lo2``
    reproduces the f64 array bit-exactly (verified in tests).  Used for
    the OPERATOR data only: a 48-bit matrix is a *fixed* perturbation
    dA, and CG converges to the perturbed system's solution — the error
    floor sits at the full normwise kappa(A) * 2^-48 bound (measured:
    -7.8 relative on bcsstk03, vs -14.4 in f64).  With the matrix exact
    and only the double-word vector arithmetic rounding (random, not
    biased), the floor drops to ~kappa-independent eps_df^2-class
    behavior (measured: -13.2 on bcsstk03).
    """
    a64 = np.asarray(a, dtype=np.float64)
    hi = a64.astype(np.float32)
    rem = a64 - hi.astype(np.float64)
    lo = rem.astype(np.float32)
    lo2 = (rem - lo.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi, dtype), jnp.asarray(lo, dtype), jnp.asarray(lo2, dtype)


def df_zeros(n, dtype=jnp.float32):
    z = jnp.zeros(n, dtype=dtype)
    return DF(z, z)


def df_where(cond, a: DF, b: DF) -> DF:
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def df_safe_div(num, den):
    """Double-word analog of :func:`..solvers.families._safe_div`:
    0 when the (collapsed) denominator is exactly 0."""
    if not isinstance(num, DF):
        num = den._coerce(num)
    if not isinstance(den, DF):
        den = num._coerce(den)
    nz = (den.hi + den.lo) != 0
    one = jnp.ones_like(den.hi)
    safe = df_where(nz, den, DF(one, jnp.zeros_like(one)))
    q = num / safe
    zero = jnp.zeros_like(q.hi)
    return df_where(nz, q, DF(zero, zero))


def _df_sum_axis1(hi, lo):
    """Compensated tree reduction of (n, L) hi/lo arrays over axis 1."""
    m = 1
    while m < hi.shape[1]:
        m *= 2
    if m != hi.shape[1]:
        pad = m - hi.shape[1]
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
    while m > 1:
        half = m // 2
        hi, lo = df_add(hi[:, :half], lo[:, :half], hi[:, half:], lo[:, half:])
        m = half
    return hi[:, 0], lo[:, 0]


def df_dot(x: DF, y: DF) -> DF:
    """Double-word inner product: EFT products + compensated tree sum.

    Forward error O(eps^2 n) relative to the exact dot of the DF inputs
    — the vector analog of ``VecDot`` under the reference's f64
    (``scaling_experiments_mpi4py/cg_variants/pr_cg.py:31-42`` packs
    these scalars; precision there comes from float64 hardware).
    """
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi + x.lo * y.lo)
    return DF(*_df_tree_sum(jnp.ravel(p), jnp.ravel(e)))


# ---------------------------------------------------------------------------
# Operators with double-word data + compensated SpMV accumulation
# ---------------------------------------------------------------------------


def _shift_df(v: DF, off: int) -> DF:
    from .operators import _shift

    return DF(_shift(v.hi, off), _shift(v.lo, off))


@jax.tree_util.register_pytree_node_class
@dataclass
class DFOperator:
    """Operator whose matrix data is an EXACT (hi, lo, lo2) three-word
    split of the f64 source (see :func:`df_split3` for why two words are
    not enough: a 48-bit matrix is a fixed kappa-amplified bias).

    ``inner`` is any of Dense/Dia/Ell operators holding the hi part;
    ``lo_data`` / ``lo2_data`` are the matching low-order arrays
    (``a`` / ``data`` / ``val`` layout).  ``mv`` runs the format's
    natural formulation with error-free product transforms and
    double-word accumulation, so the SpMV result is accurate to
    ~eps_df^2 of the EXACT f64 matrix — the recurrence-path requirement
    the round-3 accuracy study identified
    (``benchmarks/accuracy_study.json``).
    """

    inner: object
    lo_data: jnp.ndarray
    lo2_data: jnp.ndarray

    @property
    def n(self):
        return self.inner.n

    @property
    def nnz(self):
        return self.inner.nnz

    @property
    def dtype(self):
        return self.inner.dtype

    def diagonal(self) -> DF:
        from .operators import DenseOperator, DiaOperator, EllOperator

        inner = self.inner
        if isinstance(inner, DiaOperator):
            d = inner.offsets.index(0)
            return DF(inner.data[d], self.lo_data[d] + self.lo2_data[d])
        if isinstance(inner, DenseOperator):
            return DF(jnp.diagonal(inner.a),
                      jnp.diagonal(self.lo_data) + jnp.diagonal(self.lo2_data))
        if isinstance(inner, EllOperator):
            rows = jnp.arange(inner.n)[:, None]
            hit = inner.idx == rows
            return DF(
                jnp.sum(jnp.where(hit, inner.val, 0.0), axis=1),
                jnp.sum(jnp.where(hit, self.lo_data + self.lo2_data, 0.0),
                        axis=1),
            )
        raise TypeError(f"unsupported inner operator {type(inner)}")

    def mv(self, v: DF) -> DF:
        from .operators import DenseOperator, DiaOperator, EllOperator

        inner = self.inner
        if isinstance(inner, DiaOperator):
            return self._mv_dia(inner, v)
        if isinstance(inner, DenseOperator):
            if self._use_pallas_dense():
                from .df_spmv import df_dense_spmv

                return df_dense_spmv(inner.a, self.lo_data, self.lo2_data, v)
            return self._mv_gathered(inner.a, self.lo_data, self.lo2_data,
                                     v.hi, v.lo)
        if isinstance(inner, EllOperator):
            gh = v.hi[inner.idx]
            gl = v.lo[inner.idx]
            return self._mv_gathered(inner.val, self.lo_data, self.lo2_data,
                                     gh, gl)
        raise TypeError(f"unsupported inner operator {type(inner)}")

    def _use_pallas_dense(self) -> bool:
        """Dense DF kernel dispatch: the small-fixture accuracy solves
        are device-op-count-bound; the kernel collapses the whole EFT
        matvec into one op (trace-time env capture like all NCGV_*)."""
        import os

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        if os.environ.get("NCGV_DF_KERNEL", "") == "0":
            return False
        from .df_spmv import supports_df_dense

        return jax.default_backend() == "tpu" and supports_df_dense(self.n)

    def mv2(self, v: DF, w: DF):
        from .operators import DenseOperator, DiaOperator

        if isinstance(self.inner, DiaOperator) and self._use_pallas():
            from .df_spmv import df_dia_spmv2

            return df_dia_spmv2(
                self.inner.offsets, self.inner.data, self.lo_data,
                self.lo2_data, v, w,
            )
        if isinstance(self.inner, DenseOperator) and self._use_pallas_dense():
            from .df_spmv import df_dense_spmv2

            return df_dense_spmv2(self.inner.a, self.lo_data,
                                  self.lo2_data, v, w)
        return self.mv(v), self.mv(w)

    def _use_pallas(self) -> bool:
        """DF DIA kernel dispatch (TPU): one pass over the word arrays
        with the EFT ordering compiled as written — Mosaic kernels never
        pass through the HLO fusion pass, so the double-word invariant
        holds without the global fusion kill-switch.  Trace-time env
        capture like every NCGV_* flag."""
        import os

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        if os.environ.get("NCGV_DF_KERNEL", "") == "0":
            return False
        offsets = getattr(self.inner, "offsets", None)
        if offsets is None:
            return False  # DIA inner only
        from .df_spmv import supports_df

        return jax.default_backend() == "tpu" and supports_df(offsets)

    def tocsr(self):
        """Host f64 CSR of the FULL (hi + lo + lo2) matrix — feeds the
        error probes' direct solve (``callbacks/error_A_norm.py:36-39``)."""
        from .operators import DenseOperator, DiaOperator, EllOperator

        inner = self.inner
        low = np.asarray(self.lo_data, np.float64) + np.asarray(
            self.lo2_data, np.float64
        )
        if isinstance(inner, DiaOperator):
            lo = DiaOperator(inner.offsets, low)
        elif isinstance(inner, DenseOperator):
            lo = DenseOperator(low)
        elif isinstance(inner, EllOperator):
            lo = EllOperator(low, inner.idx, inner.nnz_stored)
        else:
            raise TypeError(f"unsupported inner operator {type(inner)}")
        return (inner.tocsr() + lo.tocsr()).tocsr()

    def _mv_dia(self, inner, v: DF) -> DF:
        if self._use_pallas():
            from .df_spmv import df_dia_spmv

            return df_dia_spmv(inner.offsets, inner.data, self.lo_data,
                               self.lo2_data, v)
        acc_h = jnp.zeros_like(v.hi)
        acc_l = jnp.zeros_like(v.lo)
        for d, off in enumerate(inner.offsets):
            sv = _shift_df(v, off)
            ph, e = two_prod(inner.data[d], sv.hi)
            e = e + (inner.data[d] * sv.lo + self.lo_data[d] * sv.hi
                     + self.lo_data[d] * sv.lo + self.lo2_data[d] * sv.hi)
            ph, pl = fast_two_sum(ph, e)
            acc_h, acc_l = df_add(acc_h, acc_l, ph, pl)
        return DF(acc_h, acc_l)

    @staticmethod
    def _mv_gathered(ah, al, al2, vh, vl):
        """Row-wise compensated contraction for (n, m) value layouts.

        ``vh``/``vl`` are broadcastable against ``ah`` ((m,) for dense,
        (n, m) gathered for ELL); hi products are EFT'd elementwise, the
        cross terms (incl. the exact-representation word ``al2``) ride
        the error channel, and the row reduction runs in double-word
        arithmetic.
        """
        vh = jnp.broadcast_to(vh, ah.shape)
        vl = jnp.broadcast_to(vl, ah.shape)
        p, e = two_prod(ah, vh)
        e = e + (ah * vl + al * vh + al * vl + al2 * vh)
        return DF(*_df_sum_axis1(p, e))

    def tree_flatten(self):
        return (self.inner, self.lo_data, self.lo2_data), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def df_operator(A, fmt: str = "auto") -> DFOperator:
    """Build a :class:`DFOperator` from a COO matrix / numpy array /
    numpy-backed operator, splitting the f64 data host-side (exactly,
    three words — :func:`df_split3`)."""
    from ..matio.matrix_market import CooMatrix
    from .operators import (
        DenseOperator,
        DiaOperator,
        EllOperator,
        build_dense,
        build_dia,
        build_ell,
        choose_format,
    )

    if isinstance(A, DFOperator):
        return A
    from .sym_dia import SymDiaOperator

    if isinstance(A, SymDiaOperator):
        # the accuracy mode carries the full two-triangle band (half-band
        # is a traffic optimization; DF solves are compute/op-bound).
        # HOST-side expansion: todia() would round the band to the
        # device dtype (f32 on TPU) before the exact three-word split.
        offsets, data = A.todia_host()
        hi, lo, lo2 = df_split3(data)
        return DFOperator(DiaOperator(offsets, hi), lo, lo2)
    if hasattr(A, "tocoo") and not isinstance(A, (np.ndarray, CooMatrix)):
        from .operators import coo_from_scipy

        A = coo_from_scipy(A)  # scipy sparse input
    if isinstance(A, CooMatrix):
        if fmt == "auto":
            fmt = choose_format(A)
            if fmt == "block_banded":
                # accuracy mode has no block-banded DF kernels.  Small
                # general fixtures take the DENSE path (the DF dense
                # Pallas kernel turns the whole EFT matvec into one
                # device op — the accuracy solves at these sizes are
                # op-count-bound, f32x2_cost.json); larger ones the
                # gather formulation.
                from .df_spmv import supports_df_dense

                fmt = "dense" if supports_df_dense(A.shape[0]) else "ell"
            elif fmt in ("symdia", "stencil"):
                # accuracy mode carries the full two-triangle band: the
                # half-band/stencil formulations are traffic
                # optimizations, and DF solves are compute-bound anyway
                fmt = "dia"
        if fmt == "dense":
            hi, lo, lo2 = df_split3(build_dense(A))
            return DFOperator(DenseOperator(hi), lo, lo2)
        if fmt == "dia":
            offsets, data = build_dia(A)
            hi, lo, lo2 = df_split3(data)
            return DFOperator(DiaOperator(offsets, hi), lo, lo2)
        if fmt == "ell":
            val, idx, nnz = build_ell(A)
            hi, lo, lo2 = df_split3(val)
            return DFOperator(EllOperator(hi, jnp.asarray(idx), nnz), lo, lo2)
        raise ValueError(f"unknown format {fmt!r}")
    if isinstance(A, DiaOperator):
        hi, lo, lo2 = df_split3(np.asarray(A.data))
        return DFOperator(DiaOperator(A.offsets, hi), lo, lo2)
    if isinstance(A, DenseOperator):
        hi, lo, lo2 = df_split3(np.asarray(A.a))
        return DFOperator(DenseOperator(hi), lo, lo2)
    if isinstance(A, EllOperator):
        hi, lo, lo2 = df_split3(np.asarray(A.val))
        return DFOperator(EllOperator(hi, A.idx, A.nnz_stored), lo, lo2)
    if isinstance(A, (np.ndarray,)) or hasattr(A, "__array__"):
        hi, lo, lo2 = df_split3(np.asarray(A, np.float64))
        return DFOperator(DenseOperator(hi), lo, lo2)
    raise TypeError(f"cannot build a DF operator from {type(A)}")


# ---------------------------------------------------------------------------
# Execution context
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class DFJacobi:
    """Jacobi preconditioner in double-word arithmetic."""

    def __init__(self, inv_diag: DF):
        self.inv_diag = inv_diag

    @classmethod
    def from_operator(cls, op: DFOperator):
        d = op.diagonal()
        one = jnp.ones_like(d.hi)
        return cls(DF(one, jnp.zeros_like(one)) / d)

    def apply(self, v: DF) -> DF:
        return self.inv_diag * v

    def tree_flatten(self):
        return (self.inv_diag,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class DoubleFloatContext:
    """Single-device context running every solver op in f32x2.

    The family step bodies (:mod:`..solvers.families`) run UNCHANGED:
    vector updates dispatch through :class:`DF` overloads, ``dots`` is
    the double-word inner product, and ``mv`` the compensated SpMV.
    The Pallas whole-iteration fusions don't apply in this mode (they
    are f32 single-word kernels); qualification hooks simply aren't
    present on this class, so families fall through to the generic
    formulations — identical update order.
    """

    #: marks the context for families._safe_div dispatch
    is_double_float = True

    def __init__(self, op: DFOperator, precond=None):
        self.op = op
        self.precond = precond

    @property
    def has_prec(self) -> bool:
        return self.precond is not None

    def mv(self, v):
        return self.op.mv(v)

    def mv2(self, v, w):
        return self.op.mv2(v, w)

    def prec(self, v):
        return self.precond.apply(v) if self.precond is not None else v

    def dots(self, *pairs):
        return tuple(df_dot(a, b) for (a, b) in pairs)

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(jnp.abs(sq.value()))

    def mv_dots(self, v, pairs):
        d = self.dots(*pairs)
        return self.mv(v), d

    def mv2_dots(self, v, w, pairs):
        d = self.dots(*pairs)
        y, z = self.mv2(v, w)
        return y, z, d

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        if self._use_vector_kernel():
            from .df_spmv import df_pipe_vector_phase

            a1 = a1 if isinstance(a1, DF) else x._coerce(a1)
            beta = beta if isinstance(beta, DF) else x._coerce(beta)
            return df_pipe_vector_phase(x, r, w, u, p, s, a1, beta)
        from ..solvers.context import generic_pipe_vector_phase

        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def _use_vector_kernel(self) -> bool:
        """DF pipe vector-phase kernel dispatch (TPU): with the DF SpMV
        kernel this makes the whole pipe iteration two device ops —
        the fusion-disabled elementwise graph was the remaining f32x2
        cost (f32x2_cost.json).  Trace-time env capture as usual."""
        import os

        if os.environ.get("NCGV_DISABLE_PALLAS"):
            return False
        if os.environ.get("NCGV_DF_KERNEL", "") == "0":
            return False
        return jax.default_backend() == "tpu"
