"""MatrixMarket I/O parity with scipy.io.mmread on the repo fixtures."""

import numpy as np
import pytest
import scipy.io

from new_cg_variants_tpu.matio.matrix_market import (
    load_matrix,
    matrix_path,
    read_mtx,
    write_mtx,
)


@pytest.mark.parametrize(
    "name", ["bcsstk03", "nos4", "bcsstm22", "494_bus", "model_48_8_3"]
)
def test_read_matches_scipy(name):
    path = matrix_path(name)
    ours = read_mtx(path, native=False).toarray()
    theirs = scipy.io.mmread(path).toarray() if hasattr(
        scipy.io.mmread(path), "toarray"
    ) else np.asarray(scipy.io.mmread(path))
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_symmetric_expansion():
    coo = load_matrix("bcsstk03")
    a = coo.toarray()
    np.testing.assert_allclose(a, a.T)
    assert a.shape == (112, 112)


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 7))
    a = a @ a.T
    p = tmp_path / "t.mtx"
    write_mtx(str(p), a, symmetric=True)
    back = read_mtx(str(p)).toarray()
    np.testing.assert_allclose(back, a, rtol=1e-15)
