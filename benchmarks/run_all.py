"""Full benchmark suite: the five BASELINE.json configurations.

Runs on whatever backend JAX selects (the real chip under axon; CPU
elsewhere) and writes ``benchmarks/results.json`` with per-config
time/iteration, nnz/s and forward error.  ``bench.py`` at the repo root
remains the driver's single-line headline; this suite is the breadth
measurement behind BASELINE.md comparisons:

1. HS-CG residual-history parity problem (bcsstk03, CPU-class size)
2. Chronopoulos-Gear + Meurant CG (single fused sync)
3. Ghysels-Vanroose pipelined CG
4. PR-CG (predict-and-recompute)
5. pipe-PR-CG on the PETSc banded model (the headline), plus the
   mpi4py diagonal model for the spectrum configuration

Usage: ``python benchmarks/run_all.py [--quick]``
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

# runnable as `python benchmarks/run_all.py` from anywhere
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _fetch(x):
    return float(np.asarray(x))


def time_fixed_iters(variant, op, b, iters, chunks=3):
    """Steady-state ms/iter via chained chunks + final host fetch."""
    import jax
    import jax.numpy as jnp

    from new_cg_variants_tpu.solvers.api import _resolve
    from new_cg_variants_tpu.solvers.context import Context

    init_fn, step_fn, precond = _resolve(variant, op, None)

    @jax.jit
    def init(op, b):
        return init_fn(Context(op, precond), b, jnp.zeros_like(b))

    @jax.jit
    def chunk(op, state):
        ctx = Context(op, precond)
        return jax.lax.fori_loop(0, iters, lambda _, s: step_fn(ctx, s), state)

    s = init(op, b)
    s = chunk(op, s)
    _fetch(s["nu"])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = chunk(op, s)
    _fetch(s["nu"])
    dt = time.perf_counter() - t0
    return dt / (chunks * iters), s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sizes (CI/CPU smoke)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.utils.env_info import env_info
    from new_cg_variants_tpu.utils.profiling import derived_metrics

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    n = 65_536 if args.quick else 651_264
    iters = 50 if args.quick else 200

    op, b, x_true = cgt.banded_model(n, k=32)
    op = op.astype(dtype)
    b = np.asarray(b, np.float64)

    results = {"env": env_info(), "n": n, "iters_per_chunk": iters,
               "configs": {}}

    # configs 2-5 on the banded model (matvec structure identical to the
    # reference scaling experiments); 2 matvecs/iter for pipe_pr
    for variant, mm in [("hs_cg", 1), ("cg_cg", 1), ("m_cg", 1),
                        ("gv_cg", 1), ("pr_cg", 1), ("pipe_pr_cg", 2),
                        ("pipe_p_cg", 1)]:
        t_iter, s = time_fixed_iters(variant, op, b.astype(dtype), iters)
        x = np.asarray(s["x"], np.float64)
        err = float(np.linalg.norm(x - x_true) / np.linalg.norm(x_true))
        m = derived_metrics(op, t_iter, 1, matvecs_per_iter=mm,
                            dtype_bytes=np.dtype(dtype).itemsize)
        results["configs"][variant] = {
            "ms_per_iter": t_iter * 1e3,
            "nnz_per_s": m["nnz_per_s"],
            "spmv_gbytes_per_s": m["spmv_gbytes_per_s"],
            "rel_fwd_error_after_warm+chunks": err,
        }
        print(f"{variant:>12s}: {t_iter*1e3:.3f} ms/iter, "
              f"{m['nnz_per_s']/1e9:.1f} Gnnz/s, relerr {err:.2e}",
              flush=True)
        _write(args, results)

    # config 1: residual-history parity (always f64 on host/CPU path)
    coo = cgt.load_matrix("bcsstk03")
    a = coo.toarray()
    nn = a.shape[0]
    xt = np.ones(nn) / np.sqrt(nn)
    bb = a @ xt
    t0 = time.perf_counter()
    out = cgt.run("hs_pcg", a, bb, max_iter=250, preconditioner="jacobi",
                  probes=("error_A_norm",), x_true=xt, dtype=np.float64)
    wall = time.perf_counter() - t0
    rel = out["error_A_norm"] / out["error_A_norm"][0]
    results["configs"]["hs_pcg_bcsstk03_parity"] = {
        "iters_to_1e-5": int(np.argmin(rel > 1e-5)),
        "log10_best": float(np.log10(np.nanmin(rel))),
        "wall_s_incl_compile": wall,
    }
    print(f"parity: iters-to-1e-5 = {int(np.argmin(rel > 1e-5))}, "
          f"log10 best = {np.log10(np.nanmin(rel)):.1f}")

    out_path = _write(args, results)
    print("wrote", out_path)
    return 0


def _write(args, results):
    try:
        default_out = pathlib.Path(__file__).parent / "results.json"
    except NameError:  # exec'd without __file__
        default_out = pathlib.Path("benchmarks/results.json")
    out_path = pathlib.Path(args.out or default_out)
    out_path.write_text(json.dumps(results, indent=1))
    return out_path


if __name__ == "__main__":
    sys.exit(main())
