"""Post-hoc probes vs independent NumPy recomputation of the reference
callback definitions (callbacks/updated_error_A_norm.py,
callbacks/lanczos_recurrence.py)."""

import numpy as np

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.ops.operators import as_operator
from new_cg_variants_tpu.probes import posthoc

from conftest import make_spd


def _run_with_histories(a, b, max_iter=40):
    return cgt.run(
        "hs_cg", a, b, max_iter=max_iter,
        probes=("save_r", "save_x", "alpha", "beta"), dtype=np.float64,
    )


def test_updated_error_A_norm_matches_reference_definition():
    a = make_spd(48, cond=100.0, seed=3)
    b = a @ np.linspace(0.5, 1.5, 48)
    out = _run_with_histories(a, b)
    vals = posthoc.updated_error_A_norm(as_operator(a), out)

    # reference: per-iteration solve(A, r); sqrt(error @ r)
    # (updated_error_A_norm.py:42-48)
    for k in range(0, 40, 7):
        r = out["save_r"][k]
        err = np.linalg.solve(a, r)
        assert abs(vals[k] - np.sqrt(err @ r)) <= 1e-10 * max(1.0, vals[k])


def test_lanczos_recurrence_quantities():
    a = make_spd(48, cond=50.0, seed=4)
    b = a @ np.ones(48)
    out = _run_with_histories(a, b, max_iter=20)
    posthoc.lanczos_recurrence(as_operator(a), out)

    Z = out["lanczos_z"]
    T = 20
    # z_k = (-1)^k r_k / ||r_k|| (lanczos_recurrence.py:57,65)
    for k in (0, 1, 5):
        r = out["save_r"][k]
        np.testing.assert_allclose(
            Z[:, k], (-1.0) ** k * r / np.linalg.norm(r), rtol=1e-12
        )
    # alpha/beta index mapping (lanczos_recurrence.py:61-64)
    a_cg = out["alpha"]
    b_cg = out["beta"]
    rn = np.linalg.norm(out["save_r"], axis=1)
    assert abs(out["lanczos_alpha"][0] - 1.0 / a_cg[0]) < 1e-12
    k = 3
    expect = 1.0 / a_cg[k - 1] + b_cg[k - 1] / a_cg[k - 2]
    assert abs(out["lanczos_alpha"][k - 1] - expect) < 1e-12
    expect_b = rn[k] / (a_cg[k - 1] * rn[k - 1])
    assert abs(out["lanczos_beta"][k - 1] - expect_b) < 1e-12

    # the 3-term recurrence must nearly hold in exact arithmetic regime
    assert np.nanmax(out["lanczos_3_term_error"][1:-1]) < 1e-6
    # successive Lanczos vectors near-orthogonal early on
    assert np.all(out["lanczos_orthogonality"][:5] < 1e-8)


def test_required_probes_documented():
    for name, req in posthoc.REQUIRED_PROBES.items():
        assert "save_r" in req
