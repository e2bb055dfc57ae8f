"""Matrix-free stencil fast path on the headline problem.

The PETSc model problem's off-diagonals are one constant
(``ex2a.c:86-90``), so the operator admits the O(n) window-sum stencil
formulation (``ops/stencil.py``) with no matrix storage at all: HBM
traffic per matvec drops from the (ndiags, n) DIA array (~165 MB at the
headline size) to a handful of vectors.  The DIA number stays the
honest apples-to-apples headline (the reference stores the matrix);
this arm records what the framework delivers when it is ALLOWED to
exploit the problem structure the reference's mpiaij storage throws
away.  Writes ``benchmarks/stencil.json``.  One device process.
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

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.utils.env_info import env_info

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    op, b, x_true = banded_model(N, k=K_BAND, fmt="stencil")
    op = op.astype(dtype)
    b = jnp.asarray(np.asarray(b), dtype)

    results = {"env": env_info(), "n": N, "k": K_BAND,
               "iters_per_chunk": ITERS, "configs": {}}
    out = pathlib.Path(__file__).parent / "stencil.json"
    for variant, mm in [("pipe_pr_cg", 2), ("hs_cg", 1)]:
        try:  # record the failure, keep the arm going (ell_bench.measure)
            t_iter, s = time_fixed_iters(variant, op, b, ITERS)
        except Exception as e:
            results["configs"][variant] = {"error": repr(e)[:200]}
            print(f"{variant}: FAILED {e!r}", flush=True)
            out.write_text(json.dumps(results, indent=1))
            continue
        x = np.asarray(s["x"], np.float64)
        err = float(np.linalg.norm(x - x_true) / np.linalg.norm(x_true))
        results["configs"][variant] = {
            "ms_per_iter": t_iter * 1e3,
            "nnz_per_s": op.nnz * mm / t_iter,
            "rel_fwd_error_after_warm+chunks": err,
        }
        print(f"{variant}: {t_iter*1e3:.4f} ms/iter "
              f"({op.nnz*mm/t_iter/1e9:.0f} Gnnz/s equiv), relerr {err:.2e}",
              flush=True)
        out.write_text(json.dumps(results, indent=1))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
