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

    # the DF pipe vector-phase kernel: f64 reference of the 5 AXPYs + dots
    try:
        from new_cg_variants_tpu.ops.df_spmv import df_pipe_vector_phase

        vs64 = [rng.standard_normal(N) for _ in range(6)]
        dfs = [df_split(a) for a in vs64]
        a1, beta = 0.3712345678901234, 0.1298765432109876
        x2, r2, w2, p2, s2, dots = df_pipe_vector_phase(
            *dfs, df_split(np.float64(a1)), df_split(np.float64(beta)))
        x64_, r64, w64_, u64, p64, s64 = vs64
        rx = x64_ + a1 * p64
        rr = r64 - a1 * s64
        rw = w64_ - a1 * u64
        rp = rr + beta * p64
        rs = rw + beta * s64
        errs = [rel(g, t) for g, t in
                [(x2, rx), (r2, rr), (w2, rw), (p2, rp), (s2, rs)]]
        derrs = [float(abs(d.value64() - t) / abs(t)) for d, t in
                 [(dots[0], rp @ rs), (dots[1], rr @ rs),
                  (dots[2], rs @ rs), (dots[3], rr @ rr)]]
        ok = max(errs + derrs) < 1e-12
        results["vector_phase"] = {
            "vec_errs": errs, "dot_errs": derrs,
            "verdict": "ok" if ok else "EFT-BROKEN"}
        print(f"vector_phase {'ok' if ok else 'EFT-BROKEN'}: "
              f"vec {max(errs):.2e} dots {max(derrs):.2e}", flush=True)
    except Exception as e:
        results["vector_phase"] = {"error": repr(e)[:500]}
        print("vector_phase FAILED:", repr(e)[:300], flush=True)
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
