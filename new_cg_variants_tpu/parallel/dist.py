"""Distributed solver entry points: ``shard_map`` over a device mesh.

Replaces the reference's two distributed harnesses:

* mpi4py runs ``variant(comm, A_colblock, b_local, max_iter)`` per rank
  (``scaling_experiments_mpi4py/cg_variants/*.py``) — here
  ``partition='col'`` with :class:`~.contexts.ColShardContext`.
* PETSc runs row-partitioned ``KSPSolve`` (``cg_impls/pipeprcg.c``) —
  here ``partition='row'`` with :class:`~.contexts.RowShardContext`.

The same family step functions as the single-device path execute inside
``shard_map``; XLA inserts/overlaps the collectives.  On a multi-host
TPU pod slice, call :func:`initialize_multihost` first and pass a mesh
spanning all hosts — the psum/ppermute lower to ICI collectives
(DCN between slices) with no code change.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_banded import BlockBandedOperator
from ..ops.operators import DenseOperator, DiaOperator, EllOperator
from ..probes.probes import resolve_probes
from ..solvers.api import SolveResult, _compute_x_true, _resolve
from ..solvers.engine import history_scan, tolerance_loop
from ..solvers.families import FAMILIES, family_of
from .contexts import (
    BlockBandedRowShardContext,
    ColShardContext,
    EllRowShardContext,
    RowShardContext,
)

__all__ = ["make_mesh", "dist_run", "dist_solve", "initialize_multihost"]


def _dist_chunked(
    variant, op, b, mesh, partition, preconditioner, max_iter, chunk_iters
):
    """Compiled init + fixed-iteration chunk under ``shard_map``, for the
    scaling harness's timed trials (the analog of the mpi4py timed loop,
    ``scaling_experiments_mpi4py/cg_variants/hs_cg.py:31-64``).

    Returns ``one_trial(warm) -> (seconds, final_state)``; the state
    crosses the shard_map boundary as global arrays (vectors sharded on
    the mesh axis, scalars replicated), so chunks chain without
    re-initialization and nothing below the timer can cache.
    """
    import time

    from ..solvers.api import _resolve

    partition = _check_partition(op, partition)
    b = jnp.asarray(b, dtype=op.dtype)
    x0 = jnp.zeros_like(b)
    init_fn, step_fn, precond = _resolve(variant, op, preconditioner)
    operands, op_specs, build_ctx = _local_ctx_factory(op, partition, mesh, precond)
    vec = P(AXIS)

    # state spec: vectors sharded, scalars replicated (from abstract shapes)
    def _init_local(local_operands, b_l, x0_l):
        return init_fn(build_ctx(*local_operands), b_l, x0_l)

    # State structure (which keys are vectors vs scalars) is identical in
    # the single-device context, which needs no axis names — use it to
    # derive the shard_map out_specs abstractly.
    from ..solvers.context import Context

    abstract_state = jax.eval_shape(
        lambda b_, x0_: init_fn(Context(op, precond), b_, x0_), b, x0
    )
    state_specs = jax.tree.map(
        lambda s: vec if getattr(s, "ndim", 0) >= 1 else P(), abstract_state
    )

    init_sm = jax.jit(
        jax.shard_map(
            _init_local, mesh=mesh, in_specs=(op_specs, vec, vec),
            out_specs=state_specs,
        )
    )

    def _chunk_local(local_operands, s):
        ctx = build_ctx(*local_operands)
        return jax.lax.fori_loop(0, chunk_iters, lambda _, st: step_fn(ctx, st), s)

    chunk_sm = jax.jit(
        jax.shard_map(
            _chunk_local, mesh=mesh, in_specs=(op_specs, state_specs),
            out_specs=state_specs,
        )
    )

    def one_trial(warm=False):
        s = init_sm(operands, b, x0)
        t0 = time.perf_counter()
        for _ in range(max(1, max_iter // chunk_iters)):
            s = chunk_sm(operands, s)
        float(np.asarray(s["nu"]))  # force completion through the tunnel
        return time.perf_counter() - t0, s

    return one_trial

AXIS = "i"


def _check_df_dist_args(partition, compensated, col_packed):
    """The distributed f32x2 mode is row-partitioned DIA with its own
    double-word reductions; reject configuration knobs it cannot honor
    rather than silently running a different configuration."""
    if partition not in ("auto", "row"):
        raise NotImplementedError(
            "distributed f32x2 supports partition='row' only (got "
            f"{partition!r})")
    if compensated:
        raise NotImplementedError(
            "compensated=True is meaningless under f32x2 (the mode's "
            "dots are already double-word); drop the flag")
    if not col_packed:
        raise NotImplementedError(
            "col_packed applies to the column partition only; "
            "distributed f32x2 is row-partitioned")


def _df_dist_pieces(variant, op, b, x0, preconditioner, mesh):
    """Distributed f32x2 setup: DF operator words, sharded DF vectors.

    Row-partitioned DIA only (the structure every reference scaling
    experiment uses); the operator is the exact three-word split of
    :func:`~..ops.doublefloat.df_operator` with a DIA inner, its word
    arrays column-sharded like the plain row shard.
    """
    from ..ops.doublefloat import (
        DFJacobi,
        DFOperator,
        df_operator,
        df_split,
    )
    from ..ops.sym_dia import SymDiaOperator
    from .contexts import DFRowShardContext

    if isinstance(op, DFOperator):
        op_df = op
    elif isinstance(op, SymDiaOperator):
        # df_operator expands the half-band HOST-side (exact f64 split)
        op_df = df_operator(op)
    else:
        op_df = df_operator(op, fmt="dia")
    if not isinstance(op_df.inner, DiaOperator):
        raise TypeError(
            "distributed f32x2 requires a DIA-representable operator "
            f"(got inner {type(op_df.inner).__name__})"
        )
    p = mesh.devices.size
    n = op_df.n
    if n % p:
        raise ValueError(f"n={n} must be divisible by mesh size {p}")
    offsets = op_df.inner.offsets

    key, prec_flag = family_of(variant)
    init_fn, step_fn = FAMILIES[key]
    precond = None
    if prec_flag:
        if preconditioner in (None, "identity"):
            from ..solvers.precond import IdentityPreconditioner

            precond = IdentityPreconditioner()
        elif preconditioner == "jacobi" or isinstance(preconditioner, DFJacobi):
            precond = (preconditioner if isinstance(preconditioner, DFJacobi)
                       else DFJacobi.from_operator(op_df))
        else:
            raise NotImplementedError(
                "distributed f32x2 supports preconditioner None|'jacobi'; "
                "got " + repr(preconditioner)
            )

    words = (op_df.inner.data, op_df.lo_data, op_df.lo2_data)
    word_specs = (P(None, AXIS),) * 3

    if isinstance(precond, DFJacobi):
        prec_operand = precond.inv_diag  # DF pytree, (n,) leaves
        prec_spec = jax.tree.map(lambda _: P(AXIS), prec_operand)

        def build_ctx(local_words, prec_leaf):
            return DFRowShardContext(offsets, *local_words, AXIS,
                                     DFJacobi(prec_leaf))
    else:
        prec_operand = jnp.zeros((p,), jnp.float32)
        prec_spec = P(AXIS)

        def build_ctx(local_words, prec_leaf):
            return DFRowShardContext(offsets, *local_words, AXIS, precond)

    b_df = df_split(np.asarray(b, np.float64))
    x0_df = df_split(np.zeros(n) if x0 is None
                     else np.asarray(x0, np.float64))
    return (op_df, offsets, init_fn, step_fn, precond, b_df, x0_df,
            (words, prec_operand), (word_specs, prec_spec), build_ctx)


def _df_dist_solve(op, b, variant, mesh, x0, rtol, atol, max_iter,
                   preconditioner, norm_type):
    """Distributed tolerance solve in double-word arithmetic."""
    from ..solvers.api import _df_jit, _df_selfcheck

    (op_df, offsets, init_fn, step_fn, precond, b_df, x0_df, operands,
     op_specs, build_ctx) = _df_dist_pieces(
        variant, op, b, x0, preconditioner, mesh
    )
    dfvec = jax.tree.map(lambda _: P(AXIS), b_df)

    # check_vma=False: the dots combine is an all_gather + identical
    # deterministic local reduction, so scalar outputs ARE replicated,
    # but the static analysis cannot infer that through all_gather
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(op_specs, dfvec, dfvec),
        out_specs=(dfvec, P(), P(), P()),
        check_vma=False,
    )
    def body(local_operands, b_l, x0_l):
        ctx = build_ctx(*local_operands)
        s, k, nrm, tol = tolerance_loop(
            ctx, init_fn, step_fn, b_l, x0_l, max_iter, rtol, atol, norm_type
        )
        return s["x"], k, nrm, tol

    _df_selfcheck()
    x, k, nrm, tol = _df_jit(body)(operands, b_df, x0_df)
    return SolveResult(
        x=x.value64(),
        iterations=int(k),
        norm=float(nrm),
        converged=bool(norm_type == "none" or float(nrm) <= float(tol)),
    )


def _df_dist_run(variant, op, b, mesh, x0, max_iter, preconditioner,
                 probes, x_true):
    """Distributed history run in double-word arithmetic."""
    from ..ops.doublefloat import df_split
    from ..solvers.api import _df_jit, _df_selfcheck

    (op_df, offsets, init_fn, step_fn, precond, b_df, x0_df, operands,
     op_specs, build_ctx) = _df_dist_pieces(
        variant, op, b, x0, preconditioner, mesh
    )
    probe_fns = resolve_probes(probes)
    aux_global = {"b": b_df}
    if any(name.startswith("error") for name in probe_fns):
        if x_true is None:
            x_true = _compute_x_true(op_df, np.asarray(b, np.float64))
        aux_global["x_true"] = df_split(np.asarray(x_true, np.float64))

    dfvec = jax.tree.map(lambda _: P(AXIS), b_df)
    probe_specs = {
        name: (P(None, AXIS) if name in ("save_x", "save_r") else P(None))
        for name in probe_fns
    }

    # check_vma=False: see _df_dist_solve (all_gather-combined scalars
    # are replicated by construction)
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(op_specs, dfvec, dfvec,
                  jax.tree.map(lambda _: P(AXIS), aux_global)),
        out_specs=(dfvec, probe_specs),
        check_vma=False,
    )
    def body(local_operands, b_l, x0_l, aux_l):
        ctx = build_ctx(*local_operands)
        final, hist = history_scan(
            ctx, init_fn, step_fn, probe_fns, b_l, x0_l, max_iter, aux_l
        )
        return final["x"], hist

    _df_selfcheck()
    x, hist = _df_jit(body)(operands, b_df, x0_df, aux_global)
    output = {"name": variant, "max_iter": max_iter, "x": x.value64()}
    for name in probe_fns:
        output[name] = np.asarray(hist[name])
    return output


def make_mesh(n_devices=None, devices=None):
    """1-D mesh over the row/column partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def initialize_multihost(**kwargs):
    """Multi-host initialization (the reference's Slurm/MPI layer, SURVEY
    §1 L5, replaced by jax.distributed over the pod's control plane)."""
    jax.distributed.initialize(**kwargs)


def _check_partition(op, partition):
    from ..ops.block_banded import BlockBandedOperator
    from ..ops.stencil import BandedStencilOperator
    from ..ops.sym_dia import SymDiaOperator

    row_types = (DiaOperator, EllOperator, BlockBandedOperator,
                 SymDiaOperator, BandedStencilOperator)
    if partition == "auto":
        partition = "row" if isinstance(op, row_types) else "col"
    if partition == "row" and not isinstance(op, row_types):
        raise TypeError(
            "row partition requires a DiaOperator, SymDiaOperator, "
            "BandedStencilOperator, EllOperator or BlockBandedOperator"
        )
    if partition == "col" and not isinstance(op, (DenseOperator, DiaOperator)):
        raise TypeError("col partition requires a dense-representable operator")
    return partition


def _is_stencil(op) -> bool:
    from ..ops.stencil import BandedStencilOperator

    return isinstance(op, BandedStencilOperator)


def _local_ctx_factory(op, partition, mesh, precond, compensated=False,
                       col_packed=True):
    """Returns (operands, in_specs, ctx_builder) for shard_map.

    The preconditioner rides along as a sharded operand: pointwise
    preconditioners (Jacobi) hold a global-length vector that must be
    split like every other vector (each device applies its local slice
    — the reference's rank-local ``1/diag(A) * x``, ``figure_gen.py:42``).
    """
    from ..solvers.precond import JacobiPreconditioner

    p = mesh.devices.size
    n = op.n
    if n % p:
        raise ValueError(f"n={n} must be divisible by mesh size {p}")

    if partition == "row" and isinstance(op, EllOperator):
        # ELL val/idx are (n, L) — shard rows.  The planner builds the
        # VecScatter-analog index exchange (O(interface) traffic per
        # device); when padded hop traffic would exceed the all_gather
        # it returns None and the dense exchange is kept.
        from .ell_exchange import plan_or_none

        plan = plan_or_none(np.asarray(op.idx), n, p)
        if plan is None:
            mat_operand = (op.val, op.idx)
            shifts = ()
        else:
            mat_operand = (op.val, jnp.asarray(plan.idx_remap),
                           *(jnp.asarray(a) for a in plan.send_idx))
            shifts = plan.shifts
        mat_spec = (P(AXIS, None),) * len(mat_operand)

        def build_mat_ctx(local, prec_local):
            send = tuple(a[0] for a in local[2:])  # squeeze the shard axis
            return EllRowShardContext(local[0], local[1], AXIS, prec_local,
                                      compensated=compensated,
                                      shifts=shifts, send_idx=send)
    elif partition == "row" and isinstance(op, BlockBandedOperator):
        # block-banded a_blk is (nb, bs, 3bs) — shard block rows; each
        # device's halo is ONE bs-wide block per neighbor (ppermute)
        nb = op.a_blk.shape[0]
        if nb % p:
            raise ValueError(
                f"nb={nb} block rows must be divisible by mesh size {p}"
            )
        mat_operand, mat_spec = op.a_blk, P(AXIS, None, None)
        def build_mat_ctx(local, prec_local):
            return BlockBandedRowShardContext(local, AXIS, prec_local,
                                              compensated=compensated)
    elif partition == "row" and _is_stencil(op):
        # matrix-free constant-band stencil: diagonal slice + scalar
        from .contexts import StencilRowShardContext

        k_band = op.k
        off_v = op.off_value
        mat_operand, mat_spec = jnp.asarray(op.diag), P(AXIS)

        def build_mat_ctx(local, prec_local):
            return StencilRowShardContext(local, off_v, k_band, AXIS,
                                          prec_local,
                                          compensated=compensated)
    elif partition == "row" and not isinstance(op, DiaOperator):
        # symmetric half-band: per-device EXTENDED slices (the mirror
        # reads the neighbor's data tail) stacked host-side — half the
        # matrix traffic of the DIA row shard, same halo structure
        from .contexts import SymDiaRowShardContext, sym_dia_shard_data

        h = max(int(o) for o in op.offsets)
        mat_operand = jnp.asarray(
            sym_dia_shard_data(np.asarray(op.data), p, h), op.dtype
        )
        mat_spec = P(AXIS, None, None)

        def build_mat_ctx(local, prec_local):
            return SymDiaRowShardContext(op.offsets, local[0], AXIS,
                                         prec_local,
                                         compensated=compensated)
    elif partition == "row":
        # DIA data is (ndiags, n), row-indexed — shard columns (= matrix rows)
        mat_operand, mat_spec = op.data, P(None, AXIS)
        def build_mat_ctx(local, prec_local):
            return RowShardContext(op.offsets, local, AXIS, prec_local,
                                   compensated=compensated)
    else:
        # col partition: dense (n, n) — shard columns
        a = op.a if isinstance(op, DenseOperator) else op.todense()
        mat_operand, mat_spec = a, P(None, AXIS)
        def build_mat_ctx(local, prec_local):
            return ColShardContext(local, AXIS, prec_local,
                                   compensated=compensated,
                                   packed=col_packed)

    if isinstance(precond, JacobiPreconditioner):
        prec_operand, prec_spec = precond.inv_diag, P(AXIS)
        def build(local, prec_leaf):
            return build_mat_ctx(local, JacobiPreconditioner(prec_leaf))
    else:
        # identity / function preconditioners carry no global state; a
        # FunctionPreconditioner must be shard-local (pointwise)
        prec_operand, prec_spec = jnp.zeros((p,), dtype=op.dtype), P(AXIS)
        def build(local, prec_leaf):
            return build_mat_ctx(local, precond)

    return (mat_operand, prec_operand), (mat_spec, prec_spec), build


def dist_run(
    variant,
    op,
    b,
    mesh=None,
    x0=None,
    max_iter=100,
    partition="auto",
    preconditioner=None,
    probes=("updated_residual_2_norm",),
    x_true=None,
    dtype=None,
    compensated=False,
    w_replace=None,
    w_replace_init=None,
    col_packed=True,
):
    """Distributed history run: the mesh analog of :func:`..solvers.api.run`.

    Vector probes (``save_x``/``save_r``) come back sharded on their last
    axis; scalar probes are replicated.

    ``dtype="f32x2"`` runs the whole distributed solve in double-word
    arithmetic (row-partitioned DIA; see :class:`~.contexts.
    DFRowShardContext`) — the distributed analog of
    ``api.run(dtype="f32x2")``, recovering the reference's f64-class
    accuracy across the mesh.
    """
    if dtype == "f32x2":
        _check_df_dist_args(partition, compensated, col_packed)
        if mesh is None:
            mesh = make_mesh()
        return _df_dist_run(variant, op, b, mesh, x0, max_iter,
                            preconditioner, probes, x_true)
    if dtype is not None:
        op = op.astype(dtype)
    if mesh is None:
        mesh = make_mesh()
    if any(name.startswith("error") for name in resolve_probes(probes)):
        if x_true is None:
            x_true = _compute_x_true(op, jnp.asarray(b, dtype=op.dtype))
    # auto-routed permuted block-banded operators: hoist the permutation
    # to the (host-side, pre-shard) solve boundary, exactly as api.run
    from ..ops.block_banded import solver_basis

    op, _to_basis, _from_basis = solver_basis(op)
    partition = _check_partition(op, partition)
    b = _to_basis(jnp.asarray(b, dtype=op.dtype))
    x0 = (jnp.zeros_like(b) if x0 is None
          else _to_basis(jnp.asarray(x0, dtype=op.dtype)))
    init_fn, step_fn, precond = _resolve(variant, op, preconditioner,
                                     w_replace, w_replace_init)
    probe_fns = resolve_probes(probes)

    aux_global = {"b": b}
    if any(name.startswith("error") for name in probe_fns):
        aux_global["x_true"] = _to_basis(jnp.asarray(x_true, dtype=op.dtype))

    operands, op_specs, build_ctx = _local_ctx_factory(
        op, partition, mesh, precond, compensated, col_packed
    )

    vec = P(AXIS)
    scal = P()
    probe_specs = {
        name: (P(None, AXIS) if name in ("save_x", "save_r") else P(None))
        for name in probe_fns
    }

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(op_specs, vec, vec, {k: vec for k in aux_global}),
        out_specs=(vec, probe_specs, scal),
    )
    def body(local_operands, b_l, x0_l, aux_l):
        ctx = build_ctx(*local_operands)
        final, hist = history_scan(
            ctx, init_fn, step_fn, probe_fns, b_l, x0_l, max_iter, aux_l
        )
        return final["x"], hist, final["nu"]

    x, hist, nu = jax.jit(body)(operands, b, x0, aux_global)
    output = {"name": variant, "max_iter": max_iter, "x": _from_basis(x),
              "nu": np.asarray(nu)}
    for name in probe_fns:
        h = hist[name]
        if getattr(h, "ndim", 1) == 2 and h.shape[1] == op.n:
            h = jax.vmap(_from_basis)(h)
        output[name] = np.asarray(h)
    return output


def dist_solve(
    op,
    b,
    variant="pipe_pr_cg",
    mesh=None,
    x0=None,
    rtol=1e-8,
    atol=0.0,
    max_iter=10_000,
    partition="auto",
    preconditioner=None,
    norm_type="natural",
    dtype=None,
    compensated=False,
    col_packed=True,
):
    """Distributed tolerance solve: the mesh analog of :func:`..solvers.api.solve`.

    ``dtype="f32x2"`` solves in double-word arithmetic over the mesh
    (row-partitioned DIA + None/Jacobi preconditioner).
    """
    if dtype == "f32x2":
        _check_df_dist_args(partition, compensated, col_packed)
        if mesh is None:
            mesh = make_mesh()
        return _df_dist_solve(op, b, variant, mesh, x0, rtol, atol,
                              max_iter, preconditioner, norm_type)
    if dtype is not None:
        op = op.astype(dtype)
    if mesh is None:
        mesh = make_mesh()
    # hoist auto-route permutations to the solve boundary (see dist_run)
    from ..ops.block_banded import solver_basis

    op, _to_basis, _from_basis = solver_basis(op)
    partition = _check_partition(op, partition)
    b = _to_basis(jnp.asarray(b, dtype=op.dtype))
    x0 = (jnp.zeros_like(b) if x0 is None
          else _to_basis(jnp.asarray(x0, dtype=op.dtype)))
    init_fn, step_fn, precond = _resolve(variant, op, preconditioner)
    operands, op_specs, build_ctx = _local_ctx_factory(
        op, partition, mesh, precond, compensated, col_packed
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(op_specs, P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(), P(), P()),
    )
    def body(local_operands, b_l, x0_l):
        ctx = build_ctx(*local_operands)
        s, k, nrm, tol = tolerance_loop(
            ctx, init_fn, step_fn, b_l, x0_l, max_iter, rtol, atol, norm_type
        )
        return s["x"], k, nrm, tol

    x, k, nrm, tol = jax.jit(body)(operands, b, x0)
    return SolveResult(
        x=_from_basis(x),
        iterations=int(k),
        norm=float(nrm),
        converged=bool(norm_type == "none" or float(nrm) <= float(tol)),
    )
