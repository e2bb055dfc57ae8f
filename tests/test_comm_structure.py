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
  (unpacked mode) or rides the packed ``all-reduce`` (default mode —
  the mpi4py single-buffer trick, ``cg_variants/gv_cg.py:29-38``).
"""

import pytest

from hlo_utils import compiled_step_hlo, count_ops

N, K, PDEV = 1024, 4, 4

#: expected all-reduce count per iteration (scalar sync phases, row part.)
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

#: expected TOTAL collective count per iteration, column partition,
#: packed mode — matching the reference's mpi4py Allreduce counts
#: (SURVEY §2.4: hs 3, cg 2, gv 1, pr 2, pipe_pr 1).  Meurant twins
#: share their base family's structure.
EXPECTED_COL_PACKED = {
    "hs": 3,
    "cgcg": 2,
    "gv": 1,
    "pr": 2,
    "m": 2,
    "pipe_p": 1,
    "pipe_pr": 1,
    "pipe_p_m": 1,
    "pipe_pr_m": 1,
}

COLLECTIVE_OPS = ("all-reduce", "reduce-scatter", "all-gather", "all-to-all")


def _total_collectives(hlo):
    return sum(count_ops(hlo, op) for op in COLLECTIVE_OPS)


@pytest.mark.parametrize("family", sorted(EXPECTED_SYNCS))
def test_row_partition_sync_counts(family):
    hlo = compiled_step_hlo(family, "row", n=N, k=K, pdev=PDEV)
    ar = count_ops(hlo, "all-reduce")
    cp = count_ops(hlo, "collective-permute")
    expected = EXPECTED_SYNCS[family]
    assert ar == expected, (
        f"{family}: {ar} all-reduces per iteration, expected {expected}"
    )
    assert cp > 0  # halo exchange present


@pytest.mark.parametrize("family", sorted(EXPECTED_COL_PACKED))
def test_col_partition_packed_collective_counts(family):
    """Column partition, packed mode: TOTAL collectives per iteration
    equal the reference's per-iteration Allreduce counts — gv and the
    pipe family cost exactly ONE collective latency."""
    hlo = compiled_step_hlo(
        family, "col", n=N, k=K, pdev=PDEV, ctx_kwargs={"packed": True}
    )
    total = _total_collectives(hlo)
    expected = EXPECTED_COL_PACKED[family]
    assert total == expected, (
        f"{family} col/packed: {total} collectives per iteration, "
        f"expected {expected}"
    )


@pytest.mark.parametrize("family", ["gv", "pipe_pr"])
def test_col_partition_unpacked_structure(family):
    """Unpacked mode trades the single latency for less wire traffic:
    matvec combine via reduce-scatter + one scalar all-reduce."""
    hlo = compiled_step_hlo(
        family, "col", n=N, k=K, pdev=PDEV, ctx_kwargs={"packed": False}
    )
    assert count_ops(hlo, "all-reduce") == 1
    assert count_ops(hlo, "reduce-scatter") == 1
    assert _total_collectives(hlo) == 2


@pytest.mark.parametrize("family", ["hs", "gv", "pr", "pipe_pr"])
@pytest.mark.parametrize("extra_norm", ["r", "rt"])
def test_norm_in_batch_keeps_sync_count(family, extra_norm):
    """A preconditioned solve with an unprec/prec convergence norm keeps
    the family's all-reduce count: the norm's inner product rides the
    existing sync batch (weak-4 in VERDICT r1; PETSc derives norms from
    the same reduction, ``pipeprcg.c:112-136``)."""
    hlo = compiled_step_hlo(
        family, "row", n=N, k=K, pdev=PDEV,
        identity_prec=True, extra_norm=extra_norm,
    )
    assert count_ops(hlo, "all-reduce") == EXPECTED_SYNCS[family]


def test_pipe_pr_single_halo_exchange_per_step():
    """pipe-PR's two matvecs share ONE halo exchange (fused 2-RHS)."""
    hlo = compiled_step_hlo("pipe_pr", "row", n=N, k=K, pdev=PDEV)
    cp = count_ops(hlo, "collective-permute")
    # one halo exchange = 2 directional ppermutes (left + right)
    assert cp == 2, f"expected 2 collective-permutes (one exchange), got {cp}"


@pytest.mark.parametrize("family", ["hs", "pr", "pipe_pr"])
def test_block_banded_row_partition_counts(family):
    """Distributed block-banded (general-sparse MXU path): the family's
    all-reduce count is unchanged and the block-halo exchange is ONE
    ppermute pair per matvec phase — pipe-PR's two matvecs share it
    (fused 2-RHS), the distributed analog of PETSc's mpiaij MatMult
    under the overlapped hot loop (cg_impls/pipeprcg.c:162-170)."""
    hlo = compiled_step_hlo(family, "block", n=N, k=K, pdev=PDEV)
    ar = count_ops(hlo, "all-reduce")
    cp = count_ops(hlo, "collective-permute")
    assert ar == EXPECTED_SYNCS[family], f"{family}: {ar} all-reduces"
    # every family runs ONE matvec phase per iteration here (pipe-PR's
    # two matvecs share the exchange via the fused 2-RHS stack), and one
    # block-halo exchange = 2 directional ppermutes (left + right)
    assert cp == 2, f"{family}: {cp} collective-permutes"


@pytest.mark.parametrize("family", ["hs", "pr", "pipe_pr"])
def test_symdia_row_partition_counts(family):
    """Distributed symmetric half-band: identical communication structure
    to the full-DIA row shard — same all-reduce count, one ppermute pair
    per matvec phase (the mirror's back-halo rides the exchange DIA's
    lower triangle would have used; pipe-PR's two matvecs share it via
    the fused 2-RHS stack)."""
    hlo = compiled_step_hlo(family, "symdia", n=N, k=K, pdev=PDEV)
    ar = count_ops(hlo, "all-reduce")
    cp = count_ops(hlo, "collective-permute")
    assert ar == EXPECTED_SYNCS[family], f"{family}: {ar} all-reduces"
    assert cp == 2, f"{family}: {cp} collective-permutes"
