"""Real-toolchain probe + timing of the experimental ELL gather kernel.

Answers two questions the interpret mode cannot: does Mosaic lower a
2-D dynamic gather from a VMEM-resident vector at all, and if so, does
it beat XLA's ~40M elem/s scalar-unit gather?  Writes
benchmarks/ell_kernel_check.json.  One device process.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.ops.ell_pallas import ell_spmv
    from new_cg_variants_tpu.ops.operators import from_coo

    print("backend:", jax.default_backend(), flush=True)
    out = pathlib.Path(__file__).parent / "ell_kernel_check.json"
    results = {}
    coo = cgt.load_matrix("bcsstk18")
    op = from_coo(coo, fmt="ell", dtype=jnp.float32)
    v64 = np.random.default_rng(0).standard_normal(op.n)
    v = jnp.asarray(v64, jnp.float32)
    want = coo.tocsr() @ v64
    try:
        y = ell_spmv(op.val, op.idx, v)
        err = float(np.abs(np.asarray(y, np.float64) - want).max()
                    / np.abs(want).max())
        results["correct"] = err < 1e-4
        results["rel_err"] = err
        # timing: kernel vs XLA gather, 200 chained matvecs each
        def bench(fn):
            x = v
            y = fn(x)
            float(np.asarray(y[0]))
            t0 = time.perf_counter()
            for _ in range(200):
                x = fn(x) * jnp.float32(1e-4)  # keep magnitudes bounded
            float(np.asarray(x[0]))
            return (time.perf_counter() - t0) / 200

        t_kernel = bench(jax.jit(
            lambda x: ell_spmv(op.val, op.idx, x)))
        t_xla = bench(jax.jit(
            lambda x: jnp.sum(op.val * x[op.idx], axis=1)))
        results["kernel_ms"] = t_kernel * 1e3
        results["xla_gather_ms"] = t_xla * 1e3
        results["speedup"] = t_xla / t_kernel
        print(f"kernel {t_kernel*1e3:.3f} ms vs XLA {t_xla*1e3:.3f} ms "
              f"({t_xla/t_kernel:.1f}x), rel_err {err:.1e}", flush=True)
    except Exception as e:
        results["error"] = repr(e)[:600]
        print("FAILED:", repr(e)[:300], flush=True)
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
