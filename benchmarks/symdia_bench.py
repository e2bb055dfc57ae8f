"""Symmetric half-band storage on the headline problem, real chip.

The headline DIA solve is HBM-bound at ~196 MB/iter (PERF.md roofline);
SPD matrices (all of CG's domain) admit half-band storage
(``ops/sym_dia.py``), cutting the dominant matrix term from 165 MB to
83 MB/iter.  This arm measures hs_cg and pipe_pr_cg at the headline
size through the same chained harness as the suite.  Writes
``benchmarks/symdia.json``.  One device process.
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
    op, b, x_true = banded_model(N, k=K_BAND, fmt="symdia")
    op = op.astype(dtype)
    b = jnp.asarray(np.asarray(b), dtype)

    results = {"env": env_info(), "n": N, "k": K_BAND,
               "iters_per_chunk": ITERS, "configs": {}}
    out = pathlib.Path(__file__).parent / "symdia.json"
    for variant, mm in [("pipe_pr_cg", 2), ("hs_cg", 1)]:
        try:
            t_iter, s = time_fixed_iters(variant, op, b, ITERS)
        except Exception as e:
            results["configs"][variant] = {"error": repr(e)[:300]}
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
              f"({op.nnz*mm/t_iter/1e9:.0f} Gnnz/s), relerr {err:.2e}",
              flush=True)
        out.write_text(json.dumps(results, indent=1))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
