"""What the f32x2 accuracy mode costs: f32 vs f32x2 ms/iter on chip.

Two arms:

1. ``1138_bus`` + Jacobi (the largest accuracy-study fixture): the
   configuration where the mode is the difference between never reaching
   1e-5 (f32) and matching f64's 734 iterations exactly
   (``accuracy_study.json``).
2. The banded model at n = 65,536, k = 32 (DIA formulation, 1/10 the
   headline size): the double-word DIA SpMV is ~20 VPU ops per stored
   value vs 2 — this arm records the throughput ratio on a
   bandwidth-class problem.

Timing: compiled init + fori_loop chunk (ctx closed over, scale a traced
argument — one program per arm/mode), chained perturbed-rhs trials with
host-fetch drains (PERF.md methodology).  Writes
``benchmarks/f32x2_cost.json``.  One device process.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).parent / "f32x2_cost.json"


def _fetch(x):
    return float(np.asarray(x))


def _drain_nu(state):
    nu = state["nu"]
    if hasattr(nu, "hi"):
        _fetch(nu.hi)
    else:
        _fetch(nu)


def time_mode(ctx, b, init_fn, step_fn, iters, df=False,
              trials=3, max_trials=6):
    import jax
    import jax.numpy as jnp

    def jit_for(f):
        if df:
            from new_cg_variants_tpu.solvers.api import _df_jit

            return _df_jit(f)
        return jax.jit(f)

    init_jit = jit_for(lambda scale: init_fn(ctx, b * scale, b * 0.0))
    chunk_jit = jit_for(lambda s: jax.lax.fori_loop(
        0, iters, lambda _, st: step_fn(ctx, st), s))

    # warm both programs (drained through the tunnel)
    s = chunk_jit(init_jit(jnp.float32(1.0)))
    _drain_nu(s)

    times = []
    for t in range(max_trials):
        s = init_jit(jnp.float32(1.0 + 1e-6 * (t + 1)))
        _drain_nu(s)  # drain init BEFORE the timer
        t0 = time.perf_counter()
        s = chunk_jit(s)
        _drain_nu(s)
        times.append(time.perf_counter() - t0)
        if len(times) >= trials:
            a, c = sorted(times)[:2]
            if c <= 1.05 * a:
                break
    return min(times) / iters


def main():
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.utils.env_info import env_info

    results = {"env": env_info()}

    arms = []
    coo = cgt.load_matrix("1138_bus")
    n1 = coo.shape[0]
    b1 = np.asarray(coo.tocsr() @ (np.ones(n1) / np.sqrt(n1)))
    arms.append(("1138_bus_jacobi_hs", coo, b1, "hs", "jacobi", 734))
    op2, b2, _ = cgt.banded_model(65_536, k=32)
    arms.append(("banded65k_pipe_pr", op2, np.asarray(b2), "pipe_pr", None, 200))

    for tag, A, b, family, prec, iters in arms:
        try:
            _run_arm(results, tag, A, b, family, prec, iters)
        except Exception as e:
            results[tag] = {"error": repr(e)[:400]}
            print(f"{tag}: FAILED {e!r}", flush=True)
            OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)
    return 0


def _run_arm(results, tag, A, b, family, prec, iters):
    import jax.numpy as jnp

    from new_cg_variants_tpu.ops.doublefloat import (
        DFJacobi,
        DoubleFloatContext,
        df_operator,
        df_split,
    )
    from new_cg_variants_tpu.ops.operators import as_operator
    from new_cg_variants_tpu.solvers.api import _resolve
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    init_fn, step_fn = FAMILIES[family]
    row = {"iters": iters}

    variant = f"{family}_pcg" if prec else f"{family}_cg"
    op32 = as_operator(A, dtype=jnp.float32)
    # auto-routed operators: hoisted basis, as the solver entry points do
    from new_cg_variants_tpu.ops.block_banded import solver_basis

    op32, _to32, _ = solver_basis(op32)
    _, _, precond32 = _resolve(variant, op32, prec)
    ctx32 = Context(op32, precond32)
    b32 = _to32(jnp.asarray(b, jnp.float32))
    row["f32_ms_per_iter"] = time_mode(
        ctx32, b32, init_fn, step_fn, iters) * 1e3

    opdf = df_operator(A)
    precdf = DFJacobi.from_operator(opdf) if prec else None
    ctxdf = DoubleFloatContext(opdf, precdf)
    bdf = df_split(b)
    row["f32x2_ms_per_iter"] = time_mode(
        ctxdf, bdf, init_fn, step_fn, iters, df=True) * 1e3
    row["slowdown"] = row["f32x2_ms_per_iter"] / row["f32_ms_per_iter"]
    results[tag] = row
    print(f"{tag}: f32 {row['f32_ms_per_iter']:.4f} ms/iter | "
          f"f32x2 {row['f32x2_ms_per_iter']:.4f} ms/iter | "
          f"{row['slowdown']:.1f}x", flush=True)
    OUT.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    sys.exit(main())
