"""One real-chip profiler trace of the headline steady state.

The ``-log_view``-parsing analog applied to the real device
(``strong_scaling_plots.py:43-59`` buckets MatMult/VecDot/VecAXPY): one
``with trace(dir): chunk(...)`` around a 200-iteration steady-state
pipe-PR chunk on the headline problem, then ``phase_breakdown`` into the
spmv / dots / vector / collective / other table for PERF.md.

Round-4 additions (VERDICT r3 task 5):

* the top op-level rows land in the JSON so phase attribution is
  auditable (round 3's 67.8% "other" was the unmatched Mosaic
  custom-call + lane double-counting);
* ``device_ms_per_iter`` is derived from the per-op lane total and
  reconciled against the untraced bench.py number;
* a SECOND trace of the generic (non-fused) formulation quantifies what
  the whole-iteration Pallas fusion buys on the same problem.

Writes ``benchmarks/chip_trace.json`` (+ prints the tables).  One device
process; trace directories are left under /tmp (hundreds of MB).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 655_360
K_BAND = 32
TRACE_ITERS = 200


def _traced_chunk(op, b, tdir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES
    from new_cg_variants_tpu.utils.profiling import trace

    init_fn, step_fn = FAMILIES["pipe_pr"]

    op_cls = type(op)  # DiaOperator or SymDiaOperator (round 5)

    @jax.jit
    def init(data, b):
        ctx = Context(op_cls(op.offsets, data), None)
        return init_fn(ctx, b, jnp.zeros_like(b))

    @jax.jit
    def chunk(data, state):
        ctx = Context(op_cls(op.offsets, data), None)
        return jax.lax.fori_loop(
            0, TRACE_ITERS, lambda _, s: step_fn(ctx, s), state
        )

    # warm: compile + first execution drained by a host fetch
    state = init(op.data, b)
    state = chunk(op.data, state)
    float(np.asarray(state["nu"]))

    t0 = time.perf_counter()
    with trace(tdir):
        state = chunk(op.data, state)
        float(np.asarray(state["nu"]))
    return time.perf_counter() - t0


def main():
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.utils.trace_analysis import (
        format_table,
        load_trace_events,
        op_breakdown,
        phase_breakdown,
    )

    op64, b, _ = banded_model(N, k=K_BAND)
    op = DiaOperator(op64.offsets,
                     jnp.asarray(np.asarray(op64.data), jnp.float32))
    b = jnp.asarray(np.asarray(b), jnp.float32)
    opsym64, bsym, _ = banded_model(N, k=K_BAND, fmt="symdia")
    opsym = opsym64.astype(jnp.float32)
    bsym = jnp.asarray(np.asarray(bsym), jnp.float32)

    out_doc = {"n": N, "k": K_BAND, "iters": TRACE_ITERS, "paths": {}}
    for label, env in [("symdia_fused", None), ("fused", None),
                       ("generic", "0")]:
        if env is None:
            os.environ.pop("NCGV_FULL_FUSED", None)
        else:
            os.environ["NCGV_FULL_FUSED"] = env
        tdir = f"/tmp/ncgv_chip_trace_{label}"
        wall = _traced_chunk(opsym if label.startswith("symdia") else op,
                             bsym if label.startswith("symdia") else b, tdir)
        events = load_trace_events(tdir)
        bd = phase_breakdown(events)
        ops = op_breakdown(events, top=12)
        dev_ms_iter = bd["total_us"] / 1e3 / TRACE_ITERS
        print(f"--- {label} path: {wall:.2f}s wall, "
              f"{dev_ms_iter:.4f} ms/iter device time ---", flush=True)
        print(format_table(bd))
        for r in ops[:6]:
            print(f"    {r['name'][:60]:<60s} {r['total_us']/1e3:9.2f} ms "
                  f"x{r['count']}")
        out_doc["paths"][label] = {
            "wall_s": wall,
            "device_ms_per_iter": dev_ms_iter,
            "breakdown": bd,
            "top_ops": ops,
        }
    os.environ.pop("NCGV_FULL_FUSED", None)

    out = pathlib.Path(__file__).parent / "chip_trace.json"
    out.write_text(json.dumps(out_doc, indent=1, default=str))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
