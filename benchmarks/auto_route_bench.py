"""Auto-routing benchmark rows: ``from_coo(fmt='auto')`` must land on
the hand-picked best formulation at the hand-picked speed.

Round-4 proved it for the block-banded path (`ell_results.json` auto
rows); round 5 extends `choose_format` to symdia and stencil — these
rows pin that a user loading the matrix as a plain COO (no format
knowledge) gets the measured-best kernels.  Adds ``hs_cg_auto`` rows to
``benchmarks/symdia.json`` (symmetric varying-band input → symdia) and
``benchmarks/stencil.json`` (constant-band input → stencil).  The
stencil probe requires constant off-diagonals, so the symdia arm
perturbs the model's bands to rule the stencil route out.

One device process.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from benchmarks.run_all import time_fixed_iters  # noqa: E402

N = 655_360
K_BAND = 32
ITERS = 5000


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.ops.operators import coo_from_scipy, from_coo
    from new_cg_variants_tpu.ops.stencil import BandedStencilOperator
    from new_cg_variants_tpu.ops.sym_dia import SymDiaOperator

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

    # --- symdia auto: symmetric banded with VARYING off-diagonals ---
    op64, b, x_true = cgt.banded_model(N, k=K_BAND, fmt="symdia")
    data = np.asarray(op64.data).copy()
    n = data.shape[1]
    scale = 1.0 + 0.5 * np.sin(np.arange(n) * 0.01)
    data[1:] *= scale  # break band constancy, keep symmetry + SPD-ness
    sym = SymDiaOperator(op64.offsets, data)
    coo = coo_from_scipy(sp.csr_matrix(sym.tocsr()))
    op = from_coo(coo, fmt="auto", dtype=dtype)
    assert isinstance(op, SymDiaOperator), type(op)
    bb = np.asarray(sym.tocsr() @ np.ones(n))

    p = pathlib.Path(__file__).parent / "symdia.json"
    doc = json.loads(p.read_text())
    t_iter, s = time_fixed_iters("hs_cg", op, bb, ITERS)
    doc["configs"]["hs_cg_auto"] = {
        "ms_per_iter": t_iter * 1e3,
        "note": "from_coo(fmt='auto') on a plain symmetric-banded COO "
                "(varying bands) routes to SymDiaOperator; compare the "
                "hand-constructed hs_cg row",
    }
    p.write_text(json.dumps(doc, indent=1))
    print(f"symdia auto hs_cg: {t_iter*1e3:.4f} ms/iter", flush=True)

    # --- stencil auto: the PETSc model problem itself as a COO ---
    opd, bd, xt = cgt.banded_model(N, k=K_BAND)  # constant off-bands
    coo2 = coo_from_scipy(opd.tocsr())
    op2 = from_coo(coo2, fmt="auto", dtype=dtype)
    assert isinstance(op2, BandedStencilOperator), type(op2)
    p2 = pathlib.Path(__file__).parent / "stencil.json"
    doc2 = json.loads(p2.read_text())
    t2, _ = time_fixed_iters("hs_cg", op2, np.asarray(bd), ITERS)
    doc2["configs"]["hs_cg_auto"] = {
        "ms_per_iter": t2 * 1e3,
        "note": "from_coo(fmt='auto') on the model problem's COO routes "
                "to the matrix-free stencil; compare the hand-picked "
                "hs_cg row",
    }
    p2.write_text(json.dumps(doc2, indent=1))
    print(f"stencil auto hs_cg: {t2*1e3:.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
