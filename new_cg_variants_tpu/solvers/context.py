"""Execution contexts: how a solver step touches the operator and the mesh.

The reference hard-codes its communication backend into each solver
(mpi4py solvers call ``comm.Allreduce`` directly; PETSc solvers use
``VecDotBegin/End`` split reductions — SURVEY §1).  Here the algorithm is
written once against a small context interface and the context decides
how matvecs, preconditioner applies and *fused dot batches* execute:

* :class:`Context` — single device.  ``dots`` is a plain batch of
  ``jnp.vdot``; XLA fuses the reductions.
* ``parallel.contexts.RowShardContext`` / ``ColShardContext`` — inside
  ``shard_map``: local compute + ONE ``psum`` of a packed scalar vector
  per ``dots`` call (the reference's buffer-packing trick,
  ``scaling_experiments_mpi4py/cg_variants/pipe_pr_cg.py:31-45``), and
  matvec halo exchange / reduce-scatter over the mesh axis.

Step functions must call ``dots`` once per synchronization phase with all
the inner products of that phase; this is what makes each variant's sync
structure (2 syncs for HS, 1 for CG/GV/PR/pipe-PR) explicit and lets the
distributed contexts map one ``dots`` call to one collective.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Context", "generic_pipe_vector_phase"]


class Context:
    """Single-device execution context.

    ``compensated=True`` switches every inner product to the Dekker/Knuth
    error-free-transform dot (:mod:`..ops.compensated`) — roughly double
    the working precision for the reduction-sensitive CG scalars, the
    f32-TPU substitute for the reference's float64 arithmetic.
    """

    def __init__(self, op, precond=None, compensated=False):
        self.op = op
        self.precond = precond
        self.compensated = compensated

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
        """Fused batch of inner products: one synchronization phase.

        Returns one scalar per ``(a, b)`` pair.
        """
        if self.compensated:
            from ..ops.compensated import comp_dot

            return tuple(comp_dot(a, b) for (a, b) in pairs)
        return tuple(jnp.vdot(a, b) for (a, b) in pairs)

    def norm(self, v):
        (sq,) = self.dots((v, v))
        return jnp.sqrt(sq)

    def mv_dots(self, v, pairs):
        """``(A v, dots(pairs))`` as one synchronization phase.

        The dots are issued FIRST so that on distributed contexts the
        scalar reduction overlaps the matvec (split-reduction order);
        packed contexts override this to ride one collective.
        """
        d = self.dots(*pairs)
        return self.mv(v), d

    def mv2_dots(self, v, w, pairs):
        """``(A v, A w, dots(pairs))`` as one synchronization phase."""
        d = self.dots(*pairs)
        y, z = self.mv2(v, w)
        return y, z, d

    def pipe_vector_phase(self, x, r, w, u, p, s, a1, beta):
        """Unpreconditioned pipe-P/PR vector phase + fused 4-dot batch.

        Default is the generic formulation: XLA fuses the 5 elementwise
        updates and 4 reductions into one pass already, and measured
        on-chip it beats the standalone Pallas kernel
        (:mod:`..ops.fused_step`, opt-in via ``NCGV_FUSED_STEP=1``).
        The whole-iteration fusion (:meth:`pipe_full_step`) supersedes
        both when the operator qualifies; current measured numbers live
        in PERF.md.  Returns ``(x2, r2, w2, p2, s2, (mu, delta, gamma,
        nu))``.
        """
        import os

        import jax

        if (
            os.environ.get("NCGV_FUSED_STEP")
            and jax.default_backend() == "tpu"
            and not self.compensated
            and not os.environ.get("NCGV_DISABLE_PALLAS")
        ):
            from ..ops.fused_step import fused_pipe_vector_phase

            return fused_pipe_vector_phase(x, r, w, u, p, s, a1, beta)
        return generic_pipe_vector_phase(self, x, r, w, u, p, s, a1, beta)

    def _full_fused_ok(self, n, allow_prec=False, two_rhs=False):
        """Shared qualification for the whole-iteration fusions.

        Returns ``(kind, tile, interpret)`` — ``kind`` is ``'dia'`` or
        ``'symdia'`` per the operator's storage — when the fused
        full-step kernels apply, else ``None``.  ``allow_prec`` lifts
        the unpreconditioned requirement (used by hooks that either fuse
        the Jacobi PCApply in-kernel or don't touch the preconditioner
        at all).  ``two_rhs`` selects the tile preference: the 1-matvec
        half-band kernels measure best at 16384, the 2-RHS pipe step at
        8192 (tile_scan.json).  ``NCGV_FULL_FUSED=0`` disables; ``=1``
        forces them off-TPU (interpret mode, for tests);
        ``NCGV_FUSED_TILE`` overrides the kernel tile;
        ``NCGV_SYMDIA_KERNEL=0`` disables just the half-band kernels.
        """
        import os

        import jax

        mode = os.environ.get("NCGV_FULL_FUSED", "")
        if (
            mode == "0"
            or self.compensated
            or (self.has_prec and not allow_prec)
            or getattr(self, "extra_norm", None) is not None
            or os.environ.get("NCGV_DISABLE_PALLAS")
        ):
            return None
        on_tpu = jax.default_backend() == "tpu"
        if not on_tpu and mode != "1":
            return None
        from ..ops.operators import DiaOperator
        from ..ops.sym_dia import SymDiaOperator

        tile_env = int(os.environ.get("NCGV_FUSED_TILE", 0))
        if isinstance(self.op, SymDiaOperator):
            if os.environ.get("NCGV_SYMDIA_KERNEL", "") == "0":
                return None
            from ..ops.fused_step import SYM_1MV_TILE_CHOICES, pick_tile
            from ..ops.sym_fused import supports_sym_full

            tile = tile_env or (
                pick_tile(n) if two_rhs
                else pick_tile(n, choices=SYM_1MV_TILE_CHOICES)
            )
            if self.op.data.shape[1] != n or not supports_sym_full(
                self.op.offsets, n, tile
            ):
                return None
            return "symdia", tile, (None if on_tpu else True)
        if not isinstance(self.op, DiaOperator):
            return None
        from ..ops.fused_step import pick_tile, supports_full_step

        tile = tile_env or pick_tile(n)
        if self.op.data.shape[1] != n or not supports_full_step(
            self.op.offsets, n, tile
        ):
            return None
        return "dia", tile, (None if on_tpu else True)

    def _dia_full_fused_ok(self, n, allow_prec=False):
        """Back-compat shim: ``(tile, interpret)`` for the DIA kind only."""
        ok = self._full_fused_ok(n, allow_prec)
        if ok is None or ok[0] != "dia":
            return None
        return ok[1], ok[2]

    def pipe_full_step(self, s_, a1, beta, recompute):
        """Whole-iteration fusion for unpreconditioned pipe-P/PR on DIA.

        Vector phase + 4-dot partials + both SpMVs in ONE Pallas pass
        (:func:`..ops.fused_step.fused_pipe_full_step`) — the TPU analog
        of the PETSc KSPPIPEPRCG fused hot-loop region
        (``cg_impls/pipeprcg.c:145-173``).  Returns ``None`` when the
        operator/shape/backend doesn't qualify and the caller falls back
        to the split formulation.
        """
        ok = self._full_fused_ok(s_["x"].shape[0], two_rhs=recompute)
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_pipe_full_step

            return fused_sym_pipe_full_step(
                self.op.offsets, self.op.data,
                s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
                a1, beta, recompute=recompute, tile=tile,
                interpret=interpret,
            )
        from ..ops.fused_step import fused_pipe_full_step

        return fused_pipe_full_step(
            self.op.offsets, self.op.data,
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            a1, beta, recompute=recompute, tile=tile, interpret=interpret,
        )

    def pr_full_step(self, s_, a1, beta):
        """Whole-iteration fusion for unpreconditioned PR/Meurant CG.

        beta is predicted from last iteration's scalars, so the ENTIRE
        iteration (x,r,p updates + s = A p + the 4-dot sync partials)
        is one Pallas pass (:func:`..ops.fused_family.fused_pr_full_step`)
        — the analog of the PETSc KSPPRCG hot loop
        (``cg_impls/prcg.c:122-137``).
        """
        ok = self._full_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_pr_full_step

            return fused_sym_pr_full_step(
                self.op.offsets, self.op.data,
                s_["x"], s_["r"], s_["p"], s_["s"],
                a1, beta, tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_pr_full_step

        return fused_pr_full_step(
            self.op.offsets, self.op.data,
            s_["x"], s_["r"], s_["p"], s_["s"],
            a1, beta, tile=tile, interpret=interpret,
        )

    def cgcg_matvec_phase(self, s_, a1):
        """Fused Chronopoulos-Gear phase: x,r updates + w = A r + partials."""
        ok = self._full_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_cgcg_matvec_phase

            return fused_sym_cgcg_matvec_phase(
                self.op.offsets, self.op.data,
                s_["x"], s_["r"], s_["p"], s_["s"],
                a1, tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_cgcg_matvec_phase

        return fused_cgcg_matvec_phase(
            self.op.offsets, self.op.data,
            s_["x"], s_["r"], s_["p"], s_["s"],
            a1, tile=tile, interpret=interpret,
        )

    def gv_matvec_phase(self, s_, a1):
        """Fused GV phase: x,r,w updates + t = A w + nu,eta partials."""
        ok = self._full_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_gv_matvec_phase

            return fused_sym_gv_matvec_phase(
                self.op.offsets, self.op.data,
                s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
                a1, tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_gv_matvec_phase

        return fused_gv_matvec_phase(
            self.op.offsets, self.op.data,
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            a1, tile=tile, interpret=interpret,
        )

    def hs_matvec_phase(self, rt, p, beta):
        """Fused HS second sync phase: p update + s = A p + mu partial.

        Takes the (preconditioned) residual directly, so it serves both
        hs_cg (rt = r) and hs_pcg with ANY preconditioner — HS's second
        phase never touches M.
        """
        ok = self._full_fused_ok(rt.shape[0], allow_prec=True)
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_hs_matvec_phase

            return fused_sym_hs_matvec_phase(
                self.op.offsets, self.op.data, rt, p, beta,
                tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_hs_matvec_phase

        return fused_hs_matvec_phase(
            self.op.offsets, self.op.data, rt, p, beta,
            tile=tile, interpret=interpret,
        )

    def _jacobi_fused_ok(self, n, two_rhs=False):
        """Prec-family gate: qualification + Jacobi preconditioner."""
        from .precond import JacobiPreconditioner

        if not isinstance(self.precond, JacobiPreconditioner):
            return None
        return self._full_fused_ok(n, allow_prec=True, two_rhs=two_rhs)

    def pr_full_step_prec(self, s_, a1, beta):
        """Whole-iteration Jacobi-preconditioned PR/M fusion (one pass,
        PCApply included — prcg.c:122-137 with PCJACOBI)."""
        ok = self._jacobi_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_pr_full_step_prec

            return fused_sym_pr_full_step_prec(
                self.op.offsets, self.op.data, self.precond.inv_diag,
                s_["x"], s_["r"], s_["p"], s_["s"], s_["rt"], s_["st"],
                a1, beta, tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_pr_full_step_prec

        return fused_pr_full_step_prec(
            self.op.offsets, self.op.data, self.precond.inv_diag,
            s_["x"], s_["r"], s_["p"], s_["s"], s_["rt"], s_["st"],
            a1, beta, tile=tile, interpret=interpret,
        )

    def cgcg_matvec_phase_prec(self, s_, a1):
        """Fused Jacobi-prec CG matvec phase (PCApply in-kernel)."""
        ok = self._jacobi_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_cgcg_matvec_phase_prec

            return fused_sym_cgcg_matvec_phase_prec(
                self.op.offsets, self.op.data, self.precond.inv_diag,
                s_["x"], s_["r"], s_["p"], s_["s"], a1,
                tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_cgcg_matvec_phase_prec

        return fused_cgcg_matvec_phase_prec(
            self.op.offsets, self.op.data, self.precond.inv_diag,
            s_["x"], s_["r"], s_["p"], s_["s"], a1,
            tile=tile, interpret=interpret,
        )

    def gv_matvec_phase_prec(self, s_, a1):
        """Fused Jacobi-prec GV matvec phase (PCApply in-kernel)."""
        ok = self._jacobi_fused_ok(s_["x"].shape[0])
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_gv_matvec_phase_prec

            return fused_sym_gv_matvec_phase_prec(
                self.op.offsets, self.op.data, self.precond.inv_diag,
                s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
                s_["rt"], s_["st"], a1, tile=tile, interpret=interpret,
            )
        from ..ops.fused_family import fused_gv_matvec_phase_prec

        return fused_gv_matvec_phase_prec(
            self.op.offsets, self.op.data, self.precond.inv_diag,
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            s_["rt"], s_["st"], a1, tile=tile, interpret=interpret,
        )

    def pipe_full_step_prec(self, s_, a1, beta, recompute):
        """Jacobi-preconditioned whole-iteration fusion on DIA.

        The PETSc hot region overlaps ``MatMult`` + ``PCApply`` inside
        the split reduction (``cg_impls/pipeprcg.c:162-170``); PCApply is
        elementwise for Jacobi, so here the vector phase, dot partials,
        both SpMVs AND both preconditioner applies are ONE Pallas pass
        (:func:`..ops.fused_step.fused_pipe_full_step_prec`).  Returns
        ``None`` when the configuration doesn't qualify (non-Jacobi
        preconditioner, norm-in-batch rho, non-DIA operator, ...) and the
        caller falls back to the generic formulation.
        """
        ok = self._jacobi_fused_ok(s_["x"].shape[0], two_rhs=recompute)
        if ok is None:
            return None
        kind, tile, interpret = ok
        if kind == "symdia":
            from ..ops.sym_fused import fused_sym_pipe_full_step_prec

            return fused_sym_pipe_full_step_prec(
                self.op.offsets, self.op.data, self.precond.inv_diag,
                s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
                s_["rt"], s_["st"], s_["wt"], s_["ut"],
                a1, beta, recompute=recompute, tile=tile,
                interpret=interpret,
            )
        from ..ops.fused_step import fused_pipe_full_step_prec

        return fused_pipe_full_step_prec(
            self.op.offsets, self.op.data, self.precond.inv_diag,
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            s_["rt"], s_["st"], s_["wt"], s_["ut"],
            a1, beta, recompute=recompute, tile=tile,
            interpret=interpret,
        )

    def pipe_vector_phase_prec(self, s_, a1, beta):
        """Optional fused preconditioned vector phase (kernel opt-in).

        Returns ``None`` to use the generic inline formulation (the
        measured-best default on chip, like :meth:`pipe_vector_phase`);
        ``NCGV_FUSED_STEP=1`` opts into the standalone Pallas kernel.
        Distributed row contexts override this with a kernel + one psum.
        """
        import os

        import jax

        if not (
            os.environ.get("NCGV_FUSED_STEP")
            and jax.default_backend() == "tpu"
            and not self.compensated
            and getattr(self, "extra_norm", None) is None
            and not os.environ.get("NCGV_DISABLE_PALLAS")
        ):
            return None
        from ..ops.fused_step import fused_pipe_vector_phase_prec

        return fused_pipe_vector_phase_prec(
            s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
            s_["rt"], s_["st"], s_["wt"], s_["ut"], a1, beta,
        )


def generic_pipe_vector_phase(ctx, x, r, w, u, p, s, a1, beta):
    """Reference formulation of the pipe vector phase over any context.

    The dots call is the family's single sync phase — distributed
    contexts map it to ONE psum.
    """
    x2 = x + a1 * p
    r2 = r - a1 * s
    w2 = w - a1 * u
    p2 = r2 + beta * p
    s2 = w2 + beta * s
    dots = ctx.dots((p2, s2), (r2, s2), (s2, s2), (r2, r2))
    return x2, r2, w2, p2, s2, dots
