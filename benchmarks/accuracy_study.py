"""TPU f32 iteration-count fidelity study across fixture families.

Widens ``accuracy_f32.py`` (single bcsstk03 floor comparison) to a
5-matrix, 2-variant table: on-chip f32 plain vs f32 compensated-dot
iterations-to-1e-5-relative-A-norm-error and best accuracy, against the
reference's shipped float64 histories
(``numerical_experiments/data/{matrix}_jacobi/*.npy``) — quantifying
where the error-free-transform dots buy iteration-count fidelity (the
framework's f64 substitute story, SURVEY §7 hard-parts).

Writes ``benchmarks/accuracy_study.json``.  One device process.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF_DATA = pathlib.Path(
    "/root/reference/predict_and_recompute/numerical_experiments/data"
)

#: (matrix, max_iter) — jacobi configs from figure_gen.py:245-339 with
#: affordable budgets and shipped reference data
CASES = [
    ("bcsstk03", 250),
    ("nos3", 350),
    ("nos4", 120),
    ("nos6", 130),
    ("494_bus", 500),
    ("1138_bus", 1300),
]
VARIANTS = ("hs_pcg", "pipe_pr_pcg")
TOL = 1e-5


def _metrics(hist):
    rel = np.asarray(hist, np.float64)
    rel = rel / rel[0]
    return {
        "iters_to_1e-5": int(np.argmin(rel > TOL)),
        "log10_best": float(np.log10(np.nanmin(rel))),
    }


def _ref_metrics(matrix, variant):
    p = REF_DATA / f"{matrix}_jacobi" / f"{variant}.npy"
    if not p.exists():
        return None
    trial = np.load(p, allow_pickle=True).item()
    return _metrics(trial["error_A_norm"])


def main():
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt

    results = {}
    for matrix, max_iter in CASES:
        coo = cgt.load_matrix(matrix)
        a = coo.tocsr()
        n = a.shape[0]
        x_true = np.ones(n) / np.sqrt(n)
        b = np.asarray(a @ x_true)
        row = {}
        for variant in VARIANTS:
            ent = {"ref_f64": _ref_metrics(matrix, variant)}
            for label, kw in [("f32", {}), ("f32_comp", {"compensated": True})]:
                out = cgt.run(
                    variant, coo, b, max_iter=max_iter,
                    preconditioner="jacobi", probes=("error_A_norm",),
                    x_true=x_true, dtype=jnp.float32, **kw,
                )
                ent[label] = _metrics(out["error_A_norm"])
            row[variant] = ent
            print(f"{matrix}/{variant}: "
                  f"f64 {ent['ref_f64']['iters_to_1e-5'] if ent['ref_f64'] else '?'} | "
                  f"f32 {ent['f32']['iters_to_1e-5']} | "
                  f"comp {ent['f32_comp']['iters_to_1e-5']}", flush=True)
        results[matrix] = {"n": n, "max_iter": max_iter, **row}
        out_p = pathlib.Path(__file__).parent / "accuracy_study.json"
        out_p.write_text(json.dumps(results, indent=1))
    print("wrote accuracy_study.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
