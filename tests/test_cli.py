"""CLI smoke tests (solve/scaling/convergence subcommands)."""

import json
import pathlib

import numpy as np
import pytest

from new_cg_variants_tpu.cli import main


def test_solve_banded(capsys):
    rc = main(["solve", "--problem", "banded", "-n", "2048", "-k", "4",
               "--kappa", "100", "--ksp-type", "pipe_pr_cg",
               "--rtol", "1e-7", "--max-iter", "1000"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "converged=True" in out
    assert "forward_error" in out


def test_solve_mtx_fixture(capsys):
    rc = main(["solve", "--problem", "mtx", "--matrix", "bcsstk03",
               "--ksp-type", "hs_pcg", "--pc-type", "jacobi",
               "--rtol", "1e-6", "--max-iter", "500"])
    assert rc == 0
    assert "iterations=" in capsys.readouterr().out


def test_solve_f32x2(capsys):
    rc = main(["solve", "--problem", "banded", "-n", "1024", "-k", "4",
               "--kappa", "100", "--ksp-type", "pipe_pr_cg",
               "--dtype", "f32x2", "--rtol", "1e-9", "--max-iter", "500"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "converged=True" in out


def test_solve_distributed(capsys):
    rc = main(["solve", "--problem", "banded", "-n", "2048", "-k", "4",
               "--kappa", "100", "--devices", "4", "--partition", "row",
               "--max-iter", "1000", "--rtol", "1e-7"])
    assert rc == 0
    assert "devices=4" in capsys.readouterr().out


def test_scaling_writes_results(tmp_path, capsys):
    rc = main(["scaling", "--problem", "spectrum", "-n", "1024",
               "--kappa", "100", "--variants", "hs_cg",
               "--mesh-sizes", "1", "--max-iter", "40", "--trials", "1",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    files = list(tmp_path.glob("hs_cg_p1_*.json"))
    assert len(files) == 1
    d = json.loads(files[0].read_text())
    assert d["best"] > 0
    assert (tmp_path / "env_info.json").exists()
    assert (tmp_path / "scaling.call").exists()


def test_convergence_subset(tmp_path, capsys):
    rc = main(["convergence", "--matrices", "nos4", "--variants",
               "hs_pcg,pipe_pr_pcg", "--data-dir", str(tmp_path / "d"),
               "--fig-dir", str(tmp_path / "f"), "--max-iter-cap", "60",
               "--no-plots"])
    assert rc == 0
    assert (tmp_path / "f" / "convergence_table_data.tex").exists()


def test_bad_variant_errors():
    with pytest.raises(KeyError):
        main(["solve", "--problem", "banded", "-n", "256", "-k", "2",
              "--ksp-type", "bogus_cg", "--max-iter", "5"])
