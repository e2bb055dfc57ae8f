"""mpi4py strong-scaling configuration on one chip.

The reference's mpi4py experiment: diagonal model problem n = 12288
(kappa = 1e6, rho = 0.9), 1500 fixed iterations, timed whole-loop
(``scaling_experiments_mpi4py/scaling_tests.py:30-57``; BASELINE.md
min-over-trials: hs_cg 40.97 s, pipe_pr_cg 52.78 s on ONE 16-rank node;
best over 48 nodes: gv_cg 2.70 s).

Here the whole problem fits on one chip; we time the same 1500
iterations end-to-end (single compiled program) and report total
seconds next to those baselines.  Writes ``benchmarks/spectrum.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BASELINE_1NODE = {"hs_cg": 40.97, "cg_cg": 41.35, "gv_cg": 40.73,
                  "pr_cg": 41.19, "pipe_pr_cg": 52.78}
BASELINE_BEST = {"hs_cg": 4.78, "cg_cg": 4.31, "gv_cg": 2.70,
                 "pr_cg": 4.35, "pipe_pr_cg": 3.27}

N, MAX_ITER = 12288, 1500


def main(variants=("hs_cg", "pipe_pr_cg")):
    import jax
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.solvers.api import _resolve
    from new_cg_variants_tpu.solvers.context import Context

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    op, b, x_true = cgt.model_spectrum(N)
    op = op.astype(dtype)
    b = jnp.asarray(np.asarray(b), dtype)

    out_path = pathlib.Path(__file__).resolve().parent / "spectrum.json"
    results = {}
    try:
        results = json.loads(out_path.read_text())
    except Exception:
        pass

    for variant in variants:
        init_fn, step_fn, precond = _resolve(variant, op, None)

        @jax.jit
        def run1500(op, b):
            ctx = Context(op, precond)
            s = init_fn(ctx, b, jnp.zeros_like(b))
            return jax.lax.fori_loop(
                0, MAX_ITER, lambda _, st: step_fn(ctx, st), s
            )

        s = run1500(op, b)
        float(np.asarray(s["nu"]))  # compile + warm (drained)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = run1500(op, b * (1.0 + 1e-6))  # distinct arg, same problem
            float(np.asarray(s["nu"]))
            best = min(best, time.perf_counter() - t0)
            b = b * (1.0 + 1e-7)
        err = float(np.linalg.norm(np.asarray(s["x"], np.float64) - x_true))
        results[variant] = {
            "total_s_1500_iters": best,
            "vs_1node": BASELINE_1NODE[variant] / best,
            "vs_best_48node": BASELINE_BEST[variant] / best,
            "forward_error": err,
        }
        print(f"{variant}: {best:.3f}s for 1500 iters "
              f"({BASELINE_1NODE[variant]/best:.0f}x vs 1 node, "
              f"{BASELINE_BEST[variant]/best:.1f}x vs best multi-node), "
              f"err {err:.2e}", flush=True)
        out_path.write_text(json.dumps(results, indent=1))
    return 0


def main_f32x2(variants=("hs_cg",)):
    """Accuracy-matched spectrum row: the same 1500-iteration run in the
    double-word mode, next to the f32 rows (VERDICT r4 task 8) — so the
    >1000x-vs-1-node claim has a column at the reference's f64-class
    accuracy.  Keys ``<variant>_f32x2``."""
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.solvers.api import _df_jit, _df_pieces
    from new_cg_variants_tpu.solvers.engine import history_scan

    op64, b64, x_true = cgt.model_spectrum(N)
    out_path = pathlib.Path(__file__).resolve().parent / "spectrum.json"
    results = {}
    try:
        results = json.loads(out_path.read_text())
    except Exception:
        pass

    for variant in variants:
        op, b_df, x0_df, init_fn, step_fn, precond, ctx_cls = _df_pieces(
            variant, op64, b64, None, None
        )

        import jax

        @_df_jit
        def run1500(op, b, x0):
            ctx = ctx_cls(op, precond)
            s = init_fn(ctx, b, x0)
            return jax.lax.fori_loop(
                0, MAX_ITER, lambda _, st: step_fn(ctx, st), s
            )

        s = run1500(op, b_df, x0_df)
        float(np.asarray(s["nu"].hi))  # compile + warm (drained)
        best = float("inf")
        scale = 1.0
        for _ in range(3):
            scale *= 1.0 + 1e-6
            bb = jax.tree.map(lambda a: a * np.float32(scale), b_df)
            float(np.asarray(bb.hi[0]))
            t0 = time.perf_counter()
            s = run1500(op, bb, x0_df)
            float(np.asarray(s["nu"].hi))
            best = min(best, time.perf_counter() - t0)
        x = s["x"].value64() / scale
        err = float(np.linalg.norm(x - x_true))
        results[variant + "_f32x2"] = {
            "total_s_1500_iters": best,
            "vs_1node": BASELINE_1NODE[variant] / best,
            "vs_best_48node": BASELINE_BEST[variant] / best,
            "forward_error": err,
        }
        print(f"{variant}_f32x2: {best:.3f}s for 1500 iters "
              f"({BASELINE_1NODE[variant]/best:.0f}x vs 1 node), "
              f"err {err:.2e}", flush=True)
        out_path.write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    args = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "hs_cg", "pipe_pr_cg"]
    df_args = [a[: -len("_f32x2")] for a in args if a.endswith("_f32x2")]
    f32_args = [a for a in args if not a.endswith("_f32x2")]
    rc = main(tuple(f32_args)) if f32_args else 0
    if df_args:
        rc = main_f32x2(tuple(df_args)) or rc
    sys.exit(rc)
