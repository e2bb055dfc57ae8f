"""Pallas DIA SpMV kernel parity vs the XLA shift formulation.

Runs in interpreter mode on the CPU backend (conftest pins cpu/x64); the
same kernel code compiles for TPU, where DiaOperator dispatches to it
automatically.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from new_cg_variants_tpu.matio.problems import banded_model, model_spectrum
from new_cg_variants_tpu.ops.spmv_pallas import (
    DEFAULT_TILE,
    dia_spmv,
    dia_spmv2,
    supports,
)


@pytest.mark.parametrize(
    "n,k",
    [
        (2048, 1),  # diagonal only, exact tile multiple
        (5000, 5),  # small band, ragged n
        (4099, 32),  # PETSc bandwidth, ragged n
        (1000, 8),  # n smaller than one tile
    ],
)
def test_dia_spmv_parity(n, k):
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(n)
    v = jnp.asarray(rng.standard_normal(n))
    y_ref = np.asarray(op.mv(v))
    y = np.asarray(dia_spmv(op.offsets, op.data, v, interpret=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-13, atol=1e-13 * np.abs(y_ref).max())


@pytest.mark.parametrize("n,k", [(5000, 5), (4099, 32)])
def test_dia_spmv2_parity(n, k):
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    rng = np.random.default_rng(n)
    v = jnp.asarray(rng.standard_normal(n))
    w = jnp.asarray(rng.standard_normal(n))
    y1, y2 = dia_spmv2(op.offsets, op.data, v, w, interpret=True)
    scale = float(np.abs(np.asarray(op.mv(v))).max())
    np.testing.assert_allclose(np.asarray(y1), np.asarray(op.mv(v)), rtol=1e-13, atol=1e-13 * scale)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(op.mv(w)), rtol=1e-13, atol=1e-13 * scale)


def test_spectrum_diagonal_only():
    op, b, x_true = model_spectrum(4096, kappa=1e4)
    y = np.asarray(dia_spmv(op.offsets, op.data, jnp.asarray(x_true), interpret=True))
    np.testing.assert_allclose(y, np.asarray(b), rtol=1e-13)


def test_supports_gate():
    assert supports((0, -1, 1))
    wide = tuple(range(-DEFAULT_TILE, DEFAULT_TILE + 1, 64))
    assert not supports(wide)


def test_dia_spmv_ext_halo_parity():
    """Halo-extended entry points match a manually sliced global matvec."""
    n, k, p = 4096, 8, 4
    op, _, _ = banded_model(n, k=k, kappa=100.0)
    h = k - 1
    m = n // p
    rng = np.random.default_rng(3)
    v = rng.standard_normal(n)
    y_full = np.asarray(op.mv(jnp.asarray(v)))
    data = np.asarray(op.data)
    for d in range(p):
        lo, hi = d * m, (d + 1) * m
        left = v[lo - h : lo] if lo >= h else np.concatenate([np.zeros(h - lo), v[:lo]])
        right = v[hi : hi + h] if hi + h <= n else np.concatenate([v[hi:], np.zeros(hi + h - n)])
        vext = jnp.asarray(np.concatenate([left, v[lo:hi], right]))
        local = jnp.asarray(data[:, lo:hi])
        from new_cg_variants_tpu.ops.spmv_pallas import dia_spmv_ext, dia_spmv2_ext

        y = np.asarray(dia_spmv_ext(op.offsets, local, vext, interpret=True))
        np.testing.assert_allclose(y, y_full[lo:hi], rtol=1e-13, atol=1e-12)
        y1, y2 = dia_spmv2_ext(op.offsets, local, vext, vext, interpret=True)
        np.testing.assert_allclose(np.asarray(y1), y_full[lo:hi], rtol=1e-13, atol=1e-12)


def test_fused_pipe_vector_phase_parity():
    """Fused kernel (interpret) vs the generic formulation."""
    import jax.numpy as jnp

    from new_cg_variants_tpu.ops.fused_step import fused_pipe_vector_phase
    from new_cg_variants_tpu.solvers.context import (
        Context, generic_pipe_vector_phase,
    )
    from new_cg_variants_tpu.ops.operators import DenseOperator

    rng = np.random.default_rng(11)
    n = 5000  # ragged vs the 2048 tile
    vecs = [jnp.asarray(rng.standard_normal(n)) for _ in range(6)]
    a1 = jnp.asarray(0.37)
    beta = jnp.asarray(0.81)

    ctx = Context(DenseOperator(jnp.eye(4)))  # only dots() used
    ref = generic_pipe_vector_phase(ctx, *vecs, a1, beta)
    got = fused_pipe_vector_phase(*vecs, a1, beta, interpret=True)
    for g, r in zip(got[:5], ref[:5]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-11,
                                   atol=1e-14)
    for g, r in zip(got[5], ref[5]):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-11)
