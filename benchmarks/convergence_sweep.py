"""Full convergence-artifact sweep: the reference's figure_gen main loop.

Runs every runnable (matrix, preconditioner) config from
``MATRIX_CONFIGS`` (``numerical_experiments/figure_gen.py:245-339``) with
the standard probe set AND the extended-precision exact oracle
(``figure_gen.py:53-55``), emits per-config figures + LaTeX rows, then
the reference's grouped 2x2 figures (``figure_gen.py:367-369``).

Resumable: per-variant ``.npy`` files short-circuit on re-run (the
reference README's re-run-one-variant workflow), so the sweep can be
stopped and restarted freely.  Configs run CHEAPEST FIRST (estimated by
``max_iter * nnz``) so partial runs still maximize table coverage.

Skips: fixtures absent from the mount (bcsstk17, s?rm*, s3dk*) and the
one config whose budget is out of scale for this host (bcsstk18
unpreconditioned, max_iter = 1,750,000 — ~1e13 flops of probed variant
runs; the reference ran it on a workstation over days).

Usage: python benchmarks/convergence_sweep.py [--limit N] [--cap ITERS]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

REPO = pathlib.Path(__file__).resolve().parents[1]
DATA_DIR = REPO / "artifacts" / "convergence" / "data"
FIG_DIR = REPO / "artifacts" / "convergence" / "figures"

#: configs too large for this host's CPU budget (documented skip)
SKIP = {("bcsstk18", None), ("bcsstm25", None)}

#: reference grouped-figure set (figure_gen.py:367-369) with the absent
#: s3rmq4m1 fixture substituted by bcsstk14 (closest present stk/jacobi)
GROUPED = (
    ["bcsstk15", "bcsstk14", "bcsstk03", "model_48_8_3"],
    ["jacobi", "jacobi", None, None],
)
GROUPED_VARIANTS = ["hs_pcg", "cg_pcg", "m_pcg", "gv_pcg", "pr_pcg",
                    "pipe_pr_pcg"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0,
                    help="stop after N configs (0 = all)")
    ap.add_argument("--cap", type=int, default=0,
                    help="cap per-config max_iter (quick runs)")
    ap.add_argument("--deadline-min", type=float, default=0,
                    help="stop starting new configs after this many minutes")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from new_cg_variants_tpu.harness.convergence import (
        MATRIX_CONFIGS,
        gen_convergence_table,
        load_matrix,
        parse_convergence_data,
        run_convergence_suite,
        test_matrix,
    )
    from new_cg_variants_tpu.harness import plotting

    # rank runnable configs by estimated cost
    runnable = []
    for name, max_iter, prec in MATRIX_CONFIGS:
        if (name, prec) in SKIP:
            print(f"skip {name}_{prec} (host budget, documented)")
            continue
        try:
            coo = load_matrix(name)
        except FileNotFoundError:
            continue
        mi = min(max_iter, args.cap) if args.cap else max_iter
        runnable.append((mi * coo.nnz, name, mi, prec, coo))
    runnable.sort(key=lambda t: t[0])
    print(f"{len(runnable)} runnable configs")

    t_start = time.time()
    done = 0
    for cost, name, max_iter, prec, coo in runnable:
        if args.limit and done >= args.limit:
            break
        if args.deadline_min and (time.time() - t_start) > args.deadline_min * 60:
            print("deadline reached; stopping (resume to continue)")
            break
        t0 = time.time()
        print(f"[{done+1}/{len(runnable)}] {name}_{prec} max_iter={max_iter} "
              f"(est cost {cost:.1e})", flush=True)
        test_matrix(
            coo, max_iter, name, prec,
            data_dir=str(DATA_DIR), include_exact=True, resume=True,
        )
        for quantity in ("error_A_norm", "error_2_norm", "residual_2_norm"):
            plotting.plot_matrix_test(
                name, prec, quantity,
                variants=("hs_pcg", "cg_pcg", "m_pcg", "gv_pcg",
                          "pipe_p_m_pcg", "pipe_pr_m_pcg", "pr_pcg",
                          "pipe_p_pcg", "pipe_pr_pcg"),
                data_dir=str(DATA_DIR), fig_dir=str(FIG_DIR),
            )
        parse_convergence_data(
            name, prec, data_dir=str(DATA_DIR),
            n=coo.shape[0], nnz=coo.nnz,
        )
        done += 1
        print(f"   ... {time.time()-t0:.0f}s", flush=True)

    gen_convergence_table(str(DATA_DIR), str(FIG_DIR))

    # grouped 2x2 figures over whatever configs are present
    try:
        for quantity in ("error_A_norm", "error_2_norm", "residual_2_norm"):
            plotting.plot_matrices_test(
                GROUPED[0], GROUPED[1], quantity=quantity,
                variants=GROUPED_VARIANTS,
                data_dir=str(DATA_DIR), fig_dir=str(FIG_DIR),
            )
        print("grouped figures written")
    except FileNotFoundError as e:
        print(f"grouped figures skipped (missing data: {e})")
    print(f"sweep: {done} configs in {(time.time()-t_start)/60:.1f} min")
    return 0


if __name__ == "__main__":
    sys.exit(main())
