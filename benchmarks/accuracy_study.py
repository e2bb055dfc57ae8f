"""TPU iteration-count/accuracy fidelity study across fixture families.

6-matrix table: on-chip f32 plain vs f32 compensated-dot vs f32x2
(double-word vectors + exact three-word operator, ``ops/doublefloat``)
iterations-to-1e-5-relative-A-norm-error and best accuracy, against the
reference's shipped float64 histories
(``numerical_experiments/data/{matrix}_jacobi/*.npy``).  Round 3 showed
compensated DOTS alone don't move the attainable-accuracy floor; the
f32x2 arm is the round-4 answer (VERDICT r3 task 3) — done-criterion:
iters-to-1e-5 within ~2% of the f64 counts on >=4 of 6 matrices and
log10-best within ~1 digit.

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
            for label, kw in [("f32", {"dtype": jnp.float32}),
                              ("f32_comp", {"dtype": jnp.float32,
                                            "compensated": True}),
                              ("f32x2", {"dtype": "f32x2"})]:
                try:
                    out = cgt.run(
                        variant, coo, b, max_iter=max_iter,
                        preconditioner="jacobi", probes=("error_A_norm",),
                        x_true=x_true, **kw,
                    )
                    ent[label] = _metrics(out["error_A_norm"])
                except Exception as e:  # record, keep the study going
                    ent[label] = {"error": repr(e)[:200]}
                    print(f"{matrix}/{variant}/{label}: FAILED {e!r}",
                          flush=True)
            row[variant] = ent

            def _fmt(d):
                return (f"{d['iters_to_1e-5']}@{d['log10_best']:.1f}"
                        if d and "iters_to_1e-5" in d else "?")

            print(f"{matrix}/{variant}: f64 {_fmt(ent['ref_f64'])} | "
                  f"f32 {_fmt(ent['f32'])} | comp {_fmt(ent['f32_comp'])} | "
                  f"f32x2 {_fmt(ent['f32x2'])}", flush=True)
        results[matrix] = {"n": n, "max_iter": max_iter, **row}
        out_p = pathlib.Path(__file__).parent / "accuracy_study.json"
        out_p.write_text(json.dumps(results, indent=1))
    print("wrote accuracy_study.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
