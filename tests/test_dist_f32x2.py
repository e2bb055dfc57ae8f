"""Distributed f32x2 (double-word) mode — VERDICT r4 missing #1.

The reference's distributed experiments all run in f64; the mesh analog
here is the DF row-shard context.  These tests pin (a) exact history
parity with the single-device f32x2 mode (the local SpMV performs the
identical per-row EFT sequence; only the dot summation order differs at
eps^2), (b) f64-class forward error on the spectrum configuration,
(c) the one-collective-per-sync-phase structure, and (d) the CLI path.
"""

import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.parallel import dist_run, dist_solve, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize("variant", ["hs_cg", "pr_cg", "pipe_pr_cg"])
def test_dist_f32x2_matches_single_device(variant, mesh):
    op, b, _ = cgt.banded_model(2048, k=8, kappa=1e4)
    out = dist_run(variant, op, b, mesh=mesh, max_iter=30,
                   probes=("updated_residual_2_norm",), dtype="f32x2")
    ref = cgt.run(variant, op, b, max_iter=30,
                  probes=("updated_residual_2_norm",), dtype="f32x2")
    np.testing.assert_allclose(
        out["updated_residual_2_norm"], ref["updated_residual_2_norm"],
        rtol=1e-5,
    )


def test_dist_f32x2_jacobi_matches_single_device(mesh):
    op, b, _ = cgt.banded_model(2048, k=8, kappa=1e4)
    out = dist_run("pipe_pr_pcg", op, b, mesh=mesh, max_iter=30,
                   preconditioner="jacobi",
                   probes=("updated_residual_2_norm",), dtype="f32x2")
    ref = cgt.run("pipe_pr_pcg", op, b, max_iter=30,
                  preconditioner="jacobi",
                  probes=("updated_residual_2_norm",), dtype="f32x2")
    d = np.asarray(out["updated_residual_2_norm"])
    s = np.asarray(ref["updated_residual_2_norm"])
    # tight agreement through the descent; at the double-word attainable
    # floor (~1e-10 relative by iter 5 here) the dot summation order
    # (shard-local tree + cross-device combine vs one global tree)
    # legitimately perturbs the last bits — compare the floor as a ratio
    np.testing.assert_allclose(d[:3], s[:3], rtol=1e-5)
    assert 0.5 < np.nanmin(d) / np.nanmin(s) < 2.0


def test_dist_f32x2_reaches_f64_class_error(mesh):
    """The reference's mpi4py spectrum experiment (scaled down 6x for CI
    speed): distributed f32x2 must land orders of magnitude below the
    f32 mesh floor, in the reference's f64 error class."""
    n, iters = 2048, 1500
    op, b, x_true = cgt.model_spectrum(n, kappa=1e6, rho=0.9)
    res = dist_solve(op, b, variant="hs_cg", mesh=mesh, rtol=0,
                     max_iter=iters, norm_type="none", dtype="f32x2")
    err = float(np.linalg.norm(res.x - x_true))
    res32 = dist_solve(op.astype(np.float32), np.asarray(b, np.float32),
                       variant="hs_cg", mesh=mesh, rtol=0, max_iter=iters,
                       norm_type="none")
    err32 = float(np.linalg.norm(np.asarray(res32.x, np.float64) - x_true))
    assert err < 5e-6, err
    assert err < err32 / 50, (err, err32)


def test_dist_f32x2_symdia_input_accepted(mesh):
    """SymDiaOperator input converts to the full band for the accuracy
    mode (traffic optimizations are irrelevant there)."""
    op, b, x_true = cgt.banded_model(2048, k=5, kappa=1e4, fmt="symdia")
    res = dist_solve(op, b, variant="pipe_pr_cg", mesh=mesh, rtol=1e-10,
                     max_iter=3000, dtype="f32x2")
    assert res.converged
    err = np.linalg.norm(res.x - x_true)
    assert err < 1e-4, err


def test_dist_f32x2_collective_structure(mesh):
    """ONE gather-combine per sync phase: pipe-PR costs one all-gather
    (scalars) + its halo ppermutes per iteration; no hidden psum of
    high words (which would round away the double-word carry)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from hlo_utils import count_ops
    from new_cg_variants_tpu.ops.doublefloat import df_operator, df_split
    from new_cg_variants_tpu.parallel.contexts import DFRowShardContext
    from new_cg_variants_tpu.parallel.dist import AXIS
    from new_cg_variants_tpu.solvers.families import FAMILIES

    n, k = 1024, 4
    op, b, _ = cgt.banded_model(n, k=k, kappa=100.0)
    op_df = df_operator(op, fmt="dia")
    init_fn, step_fn = FAMILIES["pipe_pr"]
    b_df = df_split(np.asarray(b))

    words = (op_df.inner.data, op_df.lo_data, op_df.lo2_data)
    dfvec = jax.tree.map(lambda _: P(AXIS), b_df)

    def local(words_l, s):
        ctx = DFRowShardContext(op_df.inner.offsets, *words_l, AXIS)
        return step_fn(ctx, s)

    from new_cg_variants_tpu.ops.doublefloat import DoubleFloatContext

    ctx0 = DoubleFloatContext(op_df)  # axis-free twin for shape inference
    abstract = jax.eval_shape(
        lambda b_: init_fn(ctx0, b_, jax.tree.map(jnp.zeros_like, b_)), b_df
    )
    specs = jax.tree.map(
        lambda s: P(AXIS) if getattr(s, "ndim", 0) >= 1 else P(), abstract
    )
    state = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.5,
                         abstract)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=((P(None, AXIS),) * 3, specs),
        out_specs=specs, check_vma=False,
    ))
    hlo = fn.lower(words, state).compile().as_text()
    assert count_ops(hlo, "all-gather") == 1, hlo.count("all-gather")
    assert count_ops(hlo, "all-reduce") == 0
    # one halo exchange (both matvecs, both words share it)
    assert count_ops(hlo, "collective-permute") == 2


def test_cli_dist_f32x2(capsys):
    from new_cg_variants_tpu.cli import main

    main(["solve", "--problem", "banded", "-n", "2048", "-k", "4",
          "--kappa", "1e4", "--ksp-type", "pipe_pr_cg", "--dtype", "f32x2",
          "--devices", "8", "--partition", "row",
          "--rtol", "1e-8", "--max-iter", "3000"])
    out = capsys.readouterr().out
    assert "devices=8" in out
    assert "converged=True" in out
    err = float(out.split("forward_error=")[1].split()[0])
    assert err < 1e-4
