"""Prove the communication hiding on REAL TPU HLO (AOT topology compile).

AOT-compiles one distributed pipe-PR-CG step for an 8-chip v5e:2x4
topology (``jax.experimental.topologies`` — compile-only, no devices
needed) and records the optimized HLO to
``artifacts/overlap/pipe_pr_step_tpu8.hlo.txt``.  The TPU compiler's
latency-hiding scheduler must lower the fused scalar reduction to an
async ``all-reduce-start``/``all-reduce-done`` pair with the SpMV work
scheduled inside the bracket — the XLA equivalent of the reference's
``VecDotBegin``/``PetscCommSplitReductionBegin`` → ``MatMult`` →
``VecDotEnd`` split (``cg_impls/pipeprcg.c:154-173``).

``tests/test_overlap_structure.py::test_tpu_async_bracket_artifact``
validates the recorded artifact on every test run; the CPU-mesh
dependence tests in the same file are the live guard against
re-serializing code changes.

Run standalone (one device process at a time — goes through the axon
remote compile tunnel, minutes): ``python benchmarks/check_overlap_hlo.py``.
Set NCGV_OVERLAP_PALLAS=1 to additionally compile the Pallas-kernel
flavor (slower compile, same collective structure).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# the XLA formulation has the same communication structure as the Pallas
# path and compiles far faster through the remote tunnel
os.environ.setdefault("NCGV_DISABLE_PALLAS", "1")

ART = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "overlap"


def compile_step_for_topology(family="pipe_pr", topology="v5e:2x4", n=65536,
                              k=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, PartitionSpec as P

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.parallel.contexts import RowShardContext
    from new_cg_variants_tpu.parallel.dist import AXIS
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topology)
    mesh = Mesh(np.array(topo.devices), (AXIS,))

    op, b, _ = banded_model(n, k=k)
    op = op.astype(jnp.float32)
    init_fn, step_fn = FAMILIES[family]
    vec = P(AXIS)

    abstract = jax.eval_shape(
        lambda b_: init_fn(Context(op, None), b_, jnp.zeros_like(b_)),
        jax.ShapeDtypeStruct((n,), jnp.float32),
    )
    specs = jax.tree.map(
        lambda s: vec if getattr(s, "ndim", 0) >= 1 else P(), abstract
    )
    state_abs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), abstract
    )

    def local_fn(mat_l, s):
        return step_fn(RowShardContext(op.offsets, mat_l, AXIS), s)

    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=(P(None, AXIS), specs),
            out_specs=specs,
        )
    )
    compiled = fn.lower(
        jax.ShapeDtypeStruct(op.data.shape, jnp.float32), state_abs
    ).compile()
    return compiled.as_text()


def check_bracket(txt):
    """Assert the overlapped schedule in the TPU module.

    Two acceptable shapes, checked in order:

    a. the scalar reduction lowered to an async
       ``all-reduce-start``/``all-reduce-done`` pair with SpMV work
       scheduled inside the bracket (the literal PETSc split), or
    b. the reduction stayed a synchronous ``all-reduce`` but is
       scheduled strictly INSIDE the async halo-exchange bracket
       (``collective-permute-start`` ... ``all-reduce`` ...
       ``collective-permute-done``) — the reduction latency and the
       SpMV's halo transfer fly concurrently, one exposed collective
       span per iteration.  This is what the v5e compiler emits today:
       its cost model keeps 16-byte reductions synchronous (async-split
       bookkeeping would cost more than it hides) and overlaps them
       with the in-flight permutes instead.
    """
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))
    from hlo_utils import entry_instructions, of_kind

    insts = entry_instructions(txt)
    order = {name: i for i, (name, _, _) in enumerate(insts)}
    starts = of_kind(insts, "all-reduce-start")
    dones = of_kind(insts, "all-reduce-done")
    cp_starts = of_kind(insts, "collective-permute-start")
    cp_dones = of_kind(insts, "collective-permute-done")
    print(f"async ar pairs: {len(starts)}; sync ar: "
          f"{len(of_kind(insts, 'all-reduce'))}; "
          f"cp pairs: {len(cp_starts)}/{len(cp_dones)}")

    if starts and dones:  # shape (a)
        i0, i1 = order[starts[0]], order[dones[0]]
        between = [op for name, op, _ in insts if i0 < order[name] < i1]
        assert "fusion" in between, "no work inside the async ar bracket"
        print(f"shape (a): async all-reduce bracket [{i0}, {i1}]")
        return "async-all-reduce"

    ars = of_kind(insts, "all-reduce")
    assert len(ars) == 1, f"expected ONE scalar all-reduce, got {ars}"
    assert cp_starts and cp_dones, "halo exchange not async"
    i_ar = order[ars[0]]
    i_start = min(order[c] for c in cp_starts)
    i_done = max(order[c] for c in cp_dones)
    print(f"shape (b): permute-start {i_start} < all-reduce {i_ar} < "
          f"permute-done {i_done}")
    assert i_start < i_ar < i_done, (
        "the scalar reduction is NOT overlapped with the halo exchange"
    )
    return "inside-halo-bracket"


def main():
    txt = compile_step_for_topology(n=651_264)
    ART.mkdir(parents=True, exist_ok=True)
    out = ART / "pipe_pr_step_tpu8.hlo.txt"
    out.write_text(txt)
    print("wrote", out, f"({len(txt)} bytes)")
    shape = check_bracket(txt)
    print(f"OVERLAP PROVEN ({shape}): the per-iteration reduction is "
          "scheduled concurrently with the SpMV's communication on TPU")


if __name__ == "__main__":
    main()
