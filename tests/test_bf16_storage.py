"""bf16 matrix-storage tier (round 5).

bf16 is storage-only: vectors/arithmetic stay f32 (solvers/api.
_vector_dtype), the Pallas kernels convert data at register level, and
the attainable error floors at the fixed-dA bound (~kappa * 2^-8) —
the measured policy lives in benchmarks/bf16_study.json.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import new_cg_variants_tpu as cgt


@pytest.mark.parametrize("fmt", ["dia", "symdia"])
def test_bf16_storage_solves_to_perturbation_floor(fmt):
    op, b, xt = cgt.banded_model(8192, k=8, kappa=100.0, fmt=fmt)
    out = cgt.run("hs_pcg", op.astype(jnp.bfloat16), b, max_iter=200,
                  preconditioner="jacobi", probes=("error_A_norm",),
                  x_true=xt)
    assert out["x"].dtype == np.float32  # vectors stay f32
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    best = np.nanmin(rel)
    # converges well past bf16's 2^-8 element precision (the fixed-dA
    # floor), nowhere near the f32 floor
    assert best < 5e-3, best
    out32 = cgt.run("hs_pcg", op.astype(jnp.float32), b, max_iter=200,
                    preconditioner="jacobi", probes=("error_A_norm",),
                    x_true=xt)
    rel32 = out32["error_A_norm"] / out32["error_A_norm"][0]
    assert np.nanmin(rel32) < best / 100  # f32 storage goes much deeper


def test_bf16_storage_fused_kernel_interpret(monkeypatch):
    """The fused half-band kernels accept bf16 data blocks (register
    convert) — interpret-mode parity vs the XLA-promoted path."""
    monkeypatch.setenv("NCGV_FULL_FUSED", "1")
    monkeypatch.setenv("NCGV_FUSED_TILE", "2048")
    op, b, xt = cgt.banded_model(4096, k=4, kappa=100.0, fmt="symdia")
    out = cgt.run("pipe_pr_cg", op.astype(jnp.bfloat16), b, max_iter=60,
                  probes=("error_A_norm",), x_true=xt)
    monkeypatch.setenv("NCGV_FULL_FUSED", "0")
    ref = cgt.run("pipe_pr_cg", op.astype(jnp.bfloat16), b, max_iter=60,
                  probes=("error_A_norm",), x_true=xt)
    a = np.asarray(out["error_A_norm"])
    r = np.asarray(ref["error_A_norm"])
    # f32 vector arithmetic (bf16 storage forces f32 vectors): the two
    # formulations diverge at f32 rounding order, not f64
    np.testing.assert_allclose(a[:8], r[:8], rtol=1e-3)
    assert 0.25 < np.nanmin(a) / np.nanmin(r) < 4.0


def test_bf16_standalone_kernels_interpret():
    """The standalone SpMV kernels accept bf16 data with f32 vectors:
    outputs and spill scratch take the VECTOR dtype (the chip failure
    mode was an f32 store into a bf16-shaped out ref)."""
    import jax.numpy as jnp

    from new_cg_variants_tpu.ops.spmv_pallas import dia_spmv
    from new_cg_variants_tpu.ops.sym_dia import sym_dia_spmv

    op, _, _ = cgt.banded_model(4096, k=8, kappa=100.0, fmt="symdia")
    v = jnp.asarray(np.random.default_rng(0).standard_normal(4096),
                    jnp.float32)
    y = sym_dia_spmv(op.astype(jnp.bfloat16).offsets,
                     op.astype(jnp.bfloat16).data, v, interpret=True)
    assert y.dtype == jnp.float32
    want = np.asarray(op.astype(jnp.float32)._mv_xla(v))
    assert np.abs(np.asarray(y) - want).max() / np.abs(want).max() < 1e-2

    opd, _, _ = cgt.banded_model(4096, k=8, kappa=100.0)
    yd = dia_spmv(opd.astype(jnp.bfloat16).offsets,
                  opd.astype(jnp.bfloat16).data, v, interpret=True)
    assert yd.dtype == jnp.float32
