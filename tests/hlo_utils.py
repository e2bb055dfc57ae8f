"""Helpers for asserting communication structure on compiled HLO text.

Used by test_comm_structure.py (collective counts) and
test_overlap_structure.py (reduction/SpMV independence — the property
that makes the communication hiding of the pipelined families possible,
cf. the reference's split non-blocking reduction bracketing the MatMults,
``scaling_experiments_petsc/cg_impls/pipeprcg.c:154-173``).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def entry_instructions(hlo_text):
    """Parse the ENTRY computation of printed HLO.

    Returns a list of ``(name, opcode, operand_names)`` in program (for a
    scheduled module: schedule) order.  Operand extraction keeps every
    ``%name`` token on the line; references to called computations
    (``calls=``/``to_apply=``) are harmless because those names are not
    entry-level instructions.
    """
    # the result type is either a plain token (f32[8192]{0:T(1024)}) or a
    # tuple "(t1, t2, ...)" whose element layouts may nest one paren level
    # (T(8,128), S(1)) — match both before the opcode
    type_re = r"(?:\((?:[^()]+|\([^()]*\))*\)|\S+)"
    inst_re = re.compile(
        rf"\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+{type_re}\s+([\w\-]+)\((.*)"
    )
    out = []
    in_entry = False
    for ln in hlo_text.splitlines():
        if ln.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if ln.strip() == "}":
                break
            m = inst_re.match(ln)
            if not m:
                continue
            name, op, rest = m.groups()
            operands = re.findall(r"%([\w.\-]+)", rest)
            out.append((name, op, operands))
    return out


def depends_on(insts, src, targets):
    """True if instruction ``src`` transitively depends on any of ``targets``."""
    deps = {n: ops for n, _, ops in insts}
    targets = set(targets)
    seen = set()
    stack = [src]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        if cur in targets:
            return True
        stack.extend(deps.get(cur, ()))
    return False


def of_kind(insts, opcode):
    """Names of entry instructions with the given opcode."""
    return [n for n, op, _ in insts if op == opcode]


def consumers_of(insts, names):
    """Entry instructions that take any of ``names`` directly as operand."""
    names = set(names)
    return [(n, op, ops) for n, op, ops in insts if names.intersection(ops)]


def count_ops(hlo_text, opname):
    """Count distinct HLO instructions of a (collective) op kind."""
    return len(re.findall(rf"= \S* {opname}", hlo_text))


def compiled_step_hlo(family, partition, *, n=1024, k=4, pdev=4, ctx_kwargs=None,
                      identity_prec=False, extra_norm=None):
    """Compile exactly ONE solver step under shard_map on the CPU mesh.

    The state is passed in abstractly (init is not part of the program),
    so collective counts/structure in the returned optimized HLO text are
    exactly the per-iteration communication structure.

    ``identity_prec`` runs the preconditioned code path (M = I);
    ``extra_norm`` sets ``ctx.extra_norm`` so the convergence norm rides
    the sync batch, as :func:`~.engine.tolerance_loop` does.
    """
    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.parallel.contexts import (
        ColShardContext,
        RowShardContext,
    )
    from new_cg_variants_tpu.parallel.dist import AXIS, make_mesh
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES
    from new_cg_variants_tpu.solvers.precond import IdentityPreconditioner
    from new_cg_variants_tpu.ops.operators import DenseOperator

    ctx_kwargs = dict(ctx_kwargs or {})
    if identity_prec:
        ctx_kwargs["precond"] = IdentityPreconditioner()
    op, b, _ = banded_model(n, k=k, kappa=100.0)
    mesh = make_mesh(pdev)
    init_fn, step_fn = FAMILIES[family]
    vec = P(AXIS)

    if partition == "row":
        mat_operand, mat_spec = op.data, P(None, AXIS)
        sd_op = op

        def build(local):
            ctx = RowShardContext(op.offsets, local, AXIS, **ctx_kwargs)
            ctx.extra_norm = extra_norm
            return ctx
    elif partition == "block":
        # block-banded (MXU general-sparse) row partition
        import numpy as np

        from new_cg_variants_tpu.matio.matrix_market import CooMatrix
        from new_cg_variants_tpu.ops.block_banded import (
            block_banded_from_coo,
        )
        from new_cg_variants_tpu.parallel.contexts import (
            BlockBandedRowShardContext,
        )

        coo = op.tocsr().tocoo()
        cm = CooMatrix((n, n), np.asarray(coo.row), np.asarray(coo.col),
                       np.asarray(coo.data))
        bop, _ = block_banded_from_coo(cm, dtype=jnp.float64, reorder=None)
        assert bop.a_blk.shape[0] % pdev == 0, "pick n so nb % pdev == 0"
        b = jnp.zeros(bop.n, b.dtype).at[: len(b)].set(jnp.asarray(b))
        mat_operand, mat_spec = bop.a_blk, P(AXIS, None, None)
        sd_op = bop

        def build(local):
            ctx = BlockBandedRowShardContext(local, AXIS, **ctx_kwargs)
            ctx.extra_norm = extra_norm
            return ctx
    elif partition == "symdia":
        # symmetric half-band row partition (extended per-device slices)
        import numpy as np

        from new_cg_variants_tpu.parallel.contexts import (
            SymDiaRowShardContext,
            sym_dia_shard_data,
        )

        sym_op, b, _ = banded_model(n, k=k, kappa=100.0, fmt="symdia")
        h = max(int(o) for o in sym_op.offsets)
        mat_operand = jnp.asarray(
            sym_dia_shard_data(np.asarray(sym_op.data), pdev, h))
        mat_spec = P(AXIS, None, None)
        sd_op = sym_op

        def build(local):
            ctx = SymDiaRowShardContext(sym_op.offsets, local[0], AXIS,
                                        **ctx_kwargs)
            ctx.extra_norm = extra_norm
            return ctx
    else:
        mat_operand, mat_spec = op.todense(), P(None, AXIS)
        sd_op = DenseOperator(mat_operand)

        def build(local):
            ctx = ColShardContext(local, AXIS, **ctx_kwargs)
            ctx.extra_norm = extra_norm
            return ctx

    sd_ctx = Context(sd_op, ctx_kwargs.get("precond"))
    sd_ctx.extra_norm = extra_norm

    def abstract_state_fn(b_):
        st = init_fn(sd_ctx, b_, jnp.zeros_like(b_))
        if extra_norm is not None:
            st["rho"] = st["nu"]
        return st

    abstract = jax.eval_shape(abstract_state_fn, jnp.asarray(b))
    specs = jax.tree.map(
        lambda s: vec if getattr(s, "ndim", 0) >= 1 else P(), abstract
    )
    state = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.5, abstract)

    def local_fn(mat_l, s):
        return step_fn(build(mat_l), s)

    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=(mat_spec, specs), out_specs=specs
        )
    )
    return fn.lower(mat_operand, state).compile().as_text()
