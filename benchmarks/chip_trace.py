"""One real-chip profiler trace of the headline steady state.

The ``-log_view``-parsing analog applied to the real device
(``strong_scaling_plots.py:43-59`` buckets MatMult/VecDot/VecAXPY): one
``with trace(dir): chunk(...)`` around a 200-iteration steady-state
pipe-PR chunk on the headline problem, then ``phase_breakdown`` into the
spmv / dots / vector / collective / other table for PERF.md.

Writes ``benchmarks/chip_trace.json`` (+ prints the table).  One device
process; the trace directory is left under /tmp (hundreds of MB).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 655_360
K_BAND = 32
TRACE_ITERS = 200


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES
    from new_cg_variants_tpu.utils.profiling import trace
    from new_cg_variants_tpu.utils.trace_analysis import (
        format_table,
        phase_breakdown,
    )

    op64, b, _ = banded_model(N, k=K_BAND)
    op = DiaOperator(op64.offsets,
                     jnp.asarray(np.asarray(op64.data), jnp.float32))
    b = jnp.asarray(b, jnp.float32)
    init_fn, step_fn = FAMILIES["pipe_pr"]

    @jax.jit
    def init(data, b):
        ctx = Context(DiaOperator(op.offsets, data), None)
        return init_fn(ctx, b, jnp.zeros_like(b))

    @jax.jit
    def chunk(data, state):
        ctx = Context(DiaOperator(op.offsets, data), None)
        return jax.lax.fori_loop(
            0, TRACE_ITERS, lambda _, s: step_fn(ctx, s), state
        )

    # warm: compile + first execution drained by a host fetch
    state = init(op.data, b)
    state = chunk(op.data, state)
    float(np.asarray(state["nu"]))

    tdir = "/tmp/ncgv_chip_trace"
    t0 = time.perf_counter()
    with trace(tdir):
        state = chunk(op.data, state)
        float(np.asarray(state["nu"]))
    wall = time.perf_counter() - t0
    print(f"traced {TRACE_ITERS} iters in {wall:.2f}s wall", flush=True)

    bd = phase_breakdown(tdir)
    print(format_table(bd))
    out = pathlib.Path(__file__).parent / "chip_trace.json"
    out.write_text(json.dumps(
        {"n": N, "k": K_BAND, "iters": TRACE_ITERS, "wall_s": wall,
         "breakdown": bd}, indent=1, default=str))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
