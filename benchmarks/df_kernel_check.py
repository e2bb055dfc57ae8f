"""Real-chip validation of the double-word DIA Pallas kernel.

Two things only the real toolchain can establish:

1. the kernel compiles under Mosaic (shapes/slice mechanics);
2. the EFT ordering survives the kernel compiler — i.e. the result
   matches the f64 truth at double-word accuracy (~1e-14 relative),
   not at f32 accuracy (~1e-7).  A contraction/reassociation that
   broke two_prod/fast_two_sum would show up as exactly that 7-decimal
   gap, the same failure mode the HLO fusion pass exhibits
   (ops/doublefloat.py docstrings).

Writes benchmarks/df_kernel_check.json.  One device process.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 16_384
K = 32


def main():
    import jax

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.ops.df_spmv import df_dia_spmv, df_dia_spmv2
    from new_cg_variants_tpu.ops.doublefloat import df_operator, df_split

    print("backend:", jax.default_backend(), flush=True)
    op, _, _ = cgt.banded_model(N, k=K)
    dop = df_operator(op, fmt="dia")
    rng = np.random.default_rng(0)
    v64 = rng.standard_normal(N)
    w64 = rng.standard_normal(N)
    v, w = df_split(v64), df_split(w64)
    a = op.tocsr()
    y64, z64 = a @ v64, a @ w64

    out = pathlib.Path(__file__).parent / "df_kernel_check.json"
    results = {}

    def rel(df_val, truth):
        got = (np.asarray(df_val.hi, np.float64)
               + np.asarray(df_val.lo, np.float64))
        return float(np.abs(got - truth).max() / np.abs(truth).max())

    try:
        y = df_dia_spmv(dop.inner.offsets, dop.inner.data, dop.lo_data,
                        dop.lo2_data, v)
        e1 = rel(y, y64)
        y2, z2 = df_dia_spmv2(dop.inner.offsets, dop.inner.data,
                              dop.lo_data, dop.lo2_data, v, w)
        e2, e3 = rel(y2, y64), rel(z2, z64)
        verdict = "ok" if max(e1, e2, e3) < 1e-12 else "EFT-BROKEN"
        results = {"rel_err_1rhs": e1, "rel_err_2rhs": [e2, e3],
                   "verdict": verdict}
        print(f"{verdict}: 1rhs {e1:.2e}, 2rhs {e2:.2e}/{e3:.2e}",
              flush=True)
    except Exception as e:
        results = {"error": repr(e)[:500]}
        print("FAILED:", repr(e), flush=True)
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
