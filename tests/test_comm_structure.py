"""Communication structure of the compiled distributed iteration.

The reference's entire point is the per-iteration synchronization count:
HS-CG needs 2 reductions, Chronopoulos-Gear/GV/PR/pipe-PR fuse to ONE
(SURVEY §2.1 sync-structure column; mpi4py Allreduce counts §2.4).  These
tests compile one distributed iteration under ``shard_map`` on the CPU
mesh and count collective ops in the optimized HLO — pinning the
communication structure itself, not just numerics:

* scalar reductions (``dots``) lower to ``all-reduce``;
* the row partition's halo exchange lowers to ``collective-permute``;
* the column partition's matvec combine lowers to ``reduce-scatter``
  (or an all-reduce variant, backend-dependent).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model
from new_cg_variants_tpu.parallel.contexts import RowShardContext, ColShardContext
from new_cg_variants_tpu.parallel.dist import AXIS, make_mesh
from new_cg_variants_tpu.solvers.families import FAMILIES
from jax.sharding import PartitionSpec as P

N, K, PDEV = 1024, 4, 4

#: expected all-reduce count per iteration (scalar sync phases)
EXPECTED_SYNCS = {
    "hs": 2,
    "cgcg": 1,
    "gv": 1,
    "pr": 1,
    "m": 1,
    "pipe_p": 1,
    "pipe_pr": 1,
    "pipe_p_m": 1,
    "pipe_pr_m": 1,
}


def _compiled_step_hlo(family, partition):
    op, b, _ = banded_model(N, k=K, kappa=100.0)
    mesh = make_mesh(PDEV)
    init_fn, step_fn = FAMILIES[family]
    vec = P(AXIS)

    if partition == "row":
        mat_operand, mat_spec = op.data, P(None, AXIS)

        def build(local):
            return RowShardContext(op.offsets, local, AXIS)
    else:
        mat_operand, mat_spec = op.todense(), P(None, AXIS)

        def build(local):
            return ColShardContext(local, AXIS)

    def local_fn(mat_l, b_l):
        ctx = build(mat_l)
        state = init_fn(ctx, b_l, jnp.zeros_like(b_l))
        return step_fn(ctx, state)

    # abstract out_specs from the single-device state structure
    from new_cg_variants_tpu.ops.operators import DiaOperator, DenseOperator
    from new_cg_variants_tpu.solvers.context import Context

    sd_op = op if partition == "row" else DenseOperator(op.todense())
    abstract = jax.eval_shape(
        lambda b_: init_fn(Context(sd_op, None), b_, jnp.zeros_like(b_)),
        jnp.asarray(b),
    )
    specs = jax.tree.map(
        lambda s: vec if getattr(s, "ndim", 0) >= 1 else P(), abstract
    )

    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=(mat_spec, vec), out_specs=specs
        )
    )
    return fn.lower(mat_operand, jnp.asarray(b)).compile().as_text()


def _op_instances(hlo, opname):
    """Count distinct HLO instructions of a collective op kind."""
    return len(re.findall(rf"= \S* {opname}", hlo))


@pytest.mark.parametrize("family", sorted(EXPECTED_SYNCS))
def test_row_partition_sync_counts(family):
    hlo = _compiled_step_hlo(family, "row")
    # init + 1 step are both in the program; per-structure multiplier = 2
    # syncs in init may differ, so bound the STEP count by halving totals
    # is fragile — instead compile init alone and subtract.
    ar_total = _op_instances(hlo, "all-reduce")
    cp_total = _op_instances(hlo, "collective-permute")
    assert ar_total > 0
    assert cp_total > 0  # halo exchange present

    # tighter check: one step alone
    hlo_step = _step_only_hlo(family, "row")
    ar = _op_instances(hlo_step, "all-reduce")
    expected = EXPECTED_SYNCS[family]
    assert ar == expected, (
        f"{family}: {ar} all-reduces per iteration, expected {expected}"
    )


def _step_only_hlo(family, partition):
    """Compile exactly one step (state passed in abstractly)."""
    op, b, _ = banded_model(N, k=K, kappa=100.0)
    mesh = make_mesh(PDEV)
    init_fn, step_fn = FAMILIES[family]
    vec = P(AXIS)

    from new_cg_variants_tpu.solvers.context import Context

    abstract = jax.eval_shape(
        lambda b_: init_fn(Context(op, None), b_, jnp.zeros_like(b_)),
        jnp.asarray(b),
    )
    specs = jax.tree.map(
        lambda s: vec if getattr(s, "ndim", 0) >= 1 else P(), abstract
    )
    state = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype) + 0.5, abstract
    )

    def local_fn(mat_l, s):
        ctx = RowShardContext(op.offsets, mat_l, AXIS)
        return step_fn(ctx, s)

    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=(P(None, AXIS), specs),
            out_specs=specs,
        )
    )
    return fn.lower(op.data, state).compile().as_text()


def test_pipe_pr_single_halo_exchange_per_step():
    """pipe-PR's two matvecs share ONE halo exchange (fused 2-RHS)."""
    hlo = _step_only_hlo("pipe_pr", "row")
    cp = _op_instances(hlo, "collective-permute")
    # one halo exchange = 2 directional ppermutes (left + right)
    assert cp == 2, f"expected 2 collective-permutes (one exchange), got {cp}"
