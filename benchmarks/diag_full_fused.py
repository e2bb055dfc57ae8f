"""Diagnose the fused full-step kernel cost split (one-off, on-chip).

Arms:
  A. fused step as shipped (sliver building in XLA each iteration)
  B. fused step with _boundary_rows stubbed to zeros (WRONG math at tile
     boundaries — perf probe only): isolates the kernel cost from the
     sliver-glue cost.
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


def time_arm(stub_halos: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops import fused_step
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    os.environ["NCGV_FULL_FUSED"] = "1"
    jax.clear_caches()
    orig = fused_step._boundary_rows
    if stub_halos:
        def _zeros(v, h, nt, tile):
            z = jnp.zeros((nt, h), v.dtype)
            return z, z
        fused_step._boundary_rows = _zeros

    try:
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
        print(f"  [stub={stub_halos}] warmup+compile {time.perf_counter()-t0:.1f}s",
              flush=True)

        t0 = time.perf_counter()
        s = state
        for _ in range(REPEATS):
            s = chunk(op.data, s)
        nu = float(np.asarray(s["nu"]))
        dt = time.perf_counter() - t0
        ms = dt / (REPEATS * ITERS) * 1e3
        print(f"  [stub={stub_halos}] {ms:.4f} ms/iter (nu={nu:.3e})", flush=True)
        return ms
    finally:
        fused_step._boundary_rows = orig


def main():
    res = {}
    for arm in (True, False):
        res[arm] = time_arm(arm)
    print(res, flush=True)


if __name__ == "__main__":
    main()
