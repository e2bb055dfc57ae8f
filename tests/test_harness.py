"""Experiment-harness tests: convergence runner, table emitter, scaling."""

import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.harness import convergence as hc
from new_cg_variants_tpu.harness import scaling as hs


@pytest.fixture(scope="module")
def bcsstk03_run(tmp_path_factory):
    td = tmp_path_factory.mktemp("conv")
    coo = cgt.load_matrix("bcsstk03")
    results = hc.test_matrix(
        coo, 130, "bcsstk03", "jacobi",
        variants=("hs_pcg", "pipe_pr_pcg"), data_dir=td, include_exact=True,
    )
    return td, results


def test_test_matrix_outputs(bcsstk03_run):
    td, results = bcsstk03_run
    assert set(results) == {"exact_pcg", "hs_pcg", "pipe_pr_pcg"}
    for v in ("hs_pcg", "pipe_pr_pcg"):
        trial = results[v]
        assert trial["error_A_norm"].shape == (130,)
        assert (td / "bcsstk03_jacobi" / f"{v}.npy").exists()
    # the oracle early-exits and truncates its history
    assert len(results["exact_pcg"]["error_A_norm"]) <= 112


def test_parse_and_table(bcsstk03_run):
    td, _ = bcsstk03_run
    row = hc.parse_convergence_data(
        "bcsstk03", "jacobi", variants=("hs_pcg", "pipe_pr_pcg"), data_dir=td
    )
    assert row.startswith(r"\texttt{bcsstk03} & Jac. & 112 & 640")

    out = hc.gen_convergence_table(td, td / "figs")
    assert out.exists()
    assert out.read_text() == row


def test_table_bolding_rule(tmp_path):
    """A variant >10% slower than the first must get \\tableemph."""
    d = tmp_path / "fake_None"
    d.mkdir()
    e0 = np.concatenate([np.geomspace(1, 1e-9, 50), np.full(50, 1e-9)])
    e1 = np.concatenate([np.geomspace(1, 1e-6, 90), np.full(10, 1e-6)])
    for name, e in (("hs_pcg", e0), ("gv_pcg", e1)):
        np.save(d / f"{name}.npy",
                {"name": name, "max_iter": 100, "error_A_norm": e},
                allow_pickle=True)
    row = hc.parse_convergence_data(
        "fake", None, variants=("hs_pcg", "gv_pcg"), data_dir=tmp_path,
        n=10, nnz=20,
    )
    assert row.count("\\tableemph") == 2  # slower iters AND worse accuracy


def test_plotting(bcsstk03_run):
    td, _ = bcsstk03_run
    from new_cg_variants_tpu.harness import plotting

    p = plotting.plot_matrix_test(
        "bcsstk03", "jacobi", "error_A_norm",
        variants=("hs_pcg", "pipe_pr_pcg"), data_dir=td, fig_dir=td / "figs",
    )
    assert p.exists() and p.stat().st_size > 0


def test_scaling_run_single_and_mesh():
    res = hs.scaling_run(
        ["hs_cg", "pipe_pr_cg"], problem="banded", n=2048, k=4, kappa=100.0,
        max_iter=60, trials=2, mesh_sizes=(1, 4), verbose=False,
    )
    assert len(res) == 4
    for r in res:
        assert r.best > 0 and np.isfinite(r.error)
        # known-solution forward error must be small after 60 iters on
        # this well-conditioned problem (scaling_tests.py:81 analog)
        assert r.error < 1e-4
    assert {r.n_devices for r in res} == {1, 4}


def test_scaling_result_roundtrip(tmp_path):
    r = hs.ScalingResult("hs_cg", 64, 10, 1, [0.2, 0.1], 1e-9)
    path = hs.save_result(r, tmp_path)
    import json

    d = json.loads(path.read_text())
    assert d["best"] == 0.1 and d["variant"] == "hs_cg"


def test_resume_skips_existing(tmp_path, monkeypatch):
    coo = cgt.load_matrix("nos4")
    hc.test_matrix(coo, 30, "nos4", None, variants=("hs_cg",), data_dir=tmp_path)
    # poison run(): resume must not call it again
    import new_cg_variants_tpu.harness.convergence as hcmod

    def boom(*a, **k):
        raise AssertionError("run() called despite resume=True")

    monkeypatch.setattr(hcmod, "run", boom)
    out = hc.test_matrix(coo, 30, "nos4", None, variants=("hs_cg",),
                         data_dir=tmp_path, resume=True)
    assert "hs_cg" in out and out["hs_cg"]["max_iter"] == 30


def test_launch_script_generation(tmp_path):
    from new_cg_variants_tpu.parallel.launch import gen_multihost_script

    paths = gen_multihost_script(tmp_path, "c:1", 4, ["solve", "-n", "64"])
    assert len(paths) == 4
    text = paths[2].read_text()
    assert "JAX_PROCESS_ID=2" in text and "JAX_NUM_PROCESSES=4" in text
    assert paths[0].stat().st_mode & 0o111
