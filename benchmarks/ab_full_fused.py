"""On-chip A/B: whole-iteration fused pipe-PR step vs split path.

Times the headline configuration (bench.py: banded model n=651264, k=32,
pipe_pr, f32) with NCGV_FULL_FUSED=1 (one Pallas pass per iteration) and
with the default split path (XLA vector phase + 2-RHS SpMV kernel).
Timing per PERF.md: chained fori_loop chunks, device-to-host fetch to
drain the tunnel, evolving state so nothing is served from a cache.

Run alone (one device process at a time): python benchmarks/ab_full_fused.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 651_264
K_BAND = 32
ITERS = 5000
REPEATS = 2


def time_arm(full_fused: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    if full_fused:
        os.environ["NCGV_FULL_FUSED"] = "1"
    else:
        os.environ["NCGV_FULL_FUSED"] = "0"

    op64, b, _ = banded_model(N, k=K_BAND)
    op = DiaOperator(op64.offsets, jnp.asarray(np.asarray(op64.data), jnp.float32))
    b = jnp.asarray(b, jnp.float32)
    init_fn, step_fn = FAMILIES["pipe_pr"]

    @jax.jit
    def init(data, b):
        ctx = Context(DiaOperator(op.offsets, data), None)
        return init_fn(ctx, b, jnp.zeros_like(b))

    @jax.jit
    def chunk(data, state):
        ctx = Context(DiaOperator(op.offsets, data), None)
        return jax.lax.fori_loop(0, ITERS, lambda _, s: step_fn(ctx, s), state)

    t0 = time.perf_counter()
    state = init(op.data, b)
    state = chunk(op.data, state)
    float(np.asarray(state["nu"]))
    print(f"  [fused={full_fused}] warmup+compile {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    s = state
    for _ in range(REPEATS):
        s = chunk(op.data, s)
    nu = float(np.asarray(s["nu"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(nu)
    ms = dt / (REPEATS * ITERS) * 1e3
    print(f"  [fused={full_fused}] {ms:.4f} ms/iter (nu={nu:.3e})", flush=True)
    return ms


def main():
    results = {}
    order = [True, False] if "--fused-first" in sys.argv else [False, True]
    if "--only-fused" in sys.argv:
        order = [True]
    for arm in order:
        results[arm] = time_arm(arm)
    print(results, flush=True)


if __name__ == "__main__":
    main()
