"""bf16 matrix-storage tier: convergence cost + headline-problem timing.

PERF.md round 4 named bf16 matrix storage (half the dominant HBM
traffic term on top of the half-band cut) as unexplored headroom.  The
tier stores the (ndiags, n) data array in bf16 while vectors and all
arithmetic stay f32 (``solvers/api._vector_dtype``); a bf16 matrix is a
FIXED perturbation dA with ||dA||/||A|| ~ 2^-8, so CG converges to the
perturbed system's solution — the same mechanism that made the 48-bit
two-word operator insufficient for the f32x2 mode
(``ops/doublefloat.df_split3`` docstring), two decades coarser.

Two arms, one device process, writes benchmarks/bf16_study.json:

1. convergence: iters-to-1e-5 relative A-norm error + log10 best on
   fixture matrices, f32 storage vs bf16 storage (both f32 compute,
   Jacobi) — quantifies the accuracy floor the policy documents;
2. timing: hs_cg + pipe_pr_cg ms/iter at the headline size on symdia
   storage, f32 vs bf16 data (the kernels convert at register level).
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

CASES = [  # (matrix, max_iter) — jacobi configs with shipped ref data
    ("bcsstk03", 250),
    ("nos4", 120),
    ("nos3", 350),
    ("494_bus", 500),
    ("1138_bus", 1300),
]


def _metrics(hist):
    rel = np.asarray(hist, np.float64)
    rel = rel / rel[0]
    reached = bool((rel < 1e-5).any())
    return {
        # None = the tolerance was never reached (the historical "0 @"
        # sentinel conflated that with instant convergence)
        "iters_to_1e-5": int(np.argmax(rel < 1e-5)) if reached else None,
        "reached_1e-5": reached,
        "log10_best": float(np.log10(np.nanmin(rel))),
    }


def main():
    import jax
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.utils.env_info import env_info

    out = pathlib.Path(__file__).parent / "bf16_study.json"
    results = {"env": env_info(), "convergence": {}, "timing": {}}

    # --- arm 1: convergence on fixtures ---
    for matrix, max_iter in CASES:
        coo = cgt.load_matrix(matrix)
        a = coo.tocsr()
        n = a.shape[0]
        x_true = np.ones(n) / np.sqrt(n)
        b = np.asarray(a @ x_true)
        row = {"n": n}
        for label, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            try:
                op = cgt.from_coo(coo, dtype=jnp.float64).astype(dt)
                o = cgt.run("hs_pcg", op, b, max_iter=max_iter,
                            preconditioner="jacobi",
                            probes=("error_A_norm",), x_true=x_true)
                row[label] = _metrics(o["error_A_norm"])
            except Exception as e:
                row[label] = {"error": repr(e)[:200]}
        results["convergence"][matrix] = row
        f = row.get("f32", {})
        g = row.get("bf16", {})
        print(f"{matrix}: f32 {f.get('iters_to_1e-5')}@"
              f"{f.get('log10_best', 0):.1f} | bf16 "
              f"{g.get('iters_to_1e-5')}@{g.get('log10_best', 0):.1f}",
              flush=True)
        out.write_text(json.dumps(results, indent=1))

    # --- arm 2: headline-size timing, symdia storage ---
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    op64, b, x_true = cgt.banded_model(N, k=K_BAND, fmt="symdia")
    b = np.asarray(b, np.float64)
    for label, op in [("f32", op64.astype(jnp.float32)),
                      ("bf16", op64.astype(jnp.bfloat16))]:
        if jax.default_backend() != "tpu":
            continue  # timing arm is chip-only
        for variant in ("hs_cg", "pipe_pr_cg"):
            try:
                t_iter, s = time_fixed_iters(
                    variant, op, b.astype(np.float32), ITERS)
                x = np.asarray(s["x"], np.float64)
                err = float(np.linalg.norm(x - x_true)
                            / np.linalg.norm(x_true))
                results["timing"][f"{variant}_{label}"] = {
                    "ms_per_iter": t_iter * 1e3,
                    "rel_fwd_error_after_warm+chunks": err,
                }
                print(f"{variant}/{label}: {t_iter*1e3:.4f} ms/iter, "
                      f"relerr {err:.2e}", flush=True)
            except Exception as e:
                results["timing"][f"{variant}_{label}"] = {
                    "error": repr(e)[:300]}
                print(f"{variant}/{label}: FAILED {e!r}", flush=True)
            out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
