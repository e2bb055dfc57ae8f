"""Headline benchmark: pipe-PR-CG time/iteration on the PETSc model problem.

Reproduces the reference's strong-scaling headline configuration on one
TPU chip: the k-banded model problem with n = 650,000, k = 32 (65
diagonals), rho = 0.95, kappa = 1e6, no preconditioner, fixed iteration
count (``scaling_experiments_petsc/strong_scaling_tests.py:119-134``,
``ex2a.c:77-95``) solved with the pipelined predict-and-recompute CG
variant (``cg_impls/pipeprcg.c``).

Baseline: the reference's own shipped timing data (min over trials, the
reference's reduction — ``strong_scaling_plots.py:88``) gives KSPPIPEPRCG
46.77 s / 4000 iterations = 11.69 ms/iter on one 14-core Intel x86 node
(SURVEY.md §6).  ``vs_baseline`` is the speedup of one TPU chip over that
one-node number: baseline_ms_per_iter / our_ms_per_iter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

# 80 * 8192: the PETSc mesh_pts=650000 rounded up to a multiple of the
# best-measured kernel tile (+0.82%; benchmarks/tile_scan.json: tile
# 8192 = 0.2450 ms/iter vs 4096 = 0.2694 at this n), so the DIA data
# needs no per-call pad copy on the kernel fast path.  Baseline ms/iter
# is size-independent enough at this delta (per-iteration cost is
# linear in n, and the extra 0.8% rows make the comparison conservative).
N = 655_360
K_BAND = 32
# 2 x 5000 chained iterations: per-dispatch tunnel latency (can be
# seconds, fluctuating) amortizes to <0.05 ms/iter of noise.  The timed
# region is additionally repeated TRIALS times and the minimum taken —
# the reference's own reduction (scaling_plots.py:53) and the only
# robust stance against the tunnel's occasional multi-second stalls
# (one stall once inflated a run from 0.245 to 5.76 ms/iter).
ITERS_PER_CHUNK = 5000
REPEATS = 2
TRIALS = 3
BASELINE_MS_PER_ITER = 46.77 / 4000 * 1000  # PETSc pipeprcg, 1 node, min over trials


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    dtype = jnp.float32
    op64, b, x_true = banded_model(N, k=K_BAND)
    op = DiaOperator(op64.offsets, jnp.asarray(np.asarray(op64.data), dtype=dtype))
    b = jnp.asarray(b, dtype=dtype)

    init_fn, step_fn = FAMILIES["pipe_pr"]

    @jax.jit
    def init(data, b):
        ctx = Context(DiaOperator(op.offsets, data), None)
        return init_fn(ctx, b, jnp.zeros_like(b))

    @jax.jit
    def chunk(data, state):
        ctx = Context(DiaOperator(op.offsets, data), None)
        state = jax.lax.fori_loop(
            0, ITERS_PER_CHUNK, lambda _, s: step_fn(ctx, s), state
        )
        return state

    # Warmup: compile + execute both programs.  The host fetch (not just
    # block_until_ready) is what actually drains compile+execution through
    # a remote-device tunnel before the timer starts.
    state = init(op.data, b)
    state = chunk(op.data, state)
    float(np.asarray(state["nu"]))

    # Time REPEATS chained chunks per trial: every call sees a distinct
    # input state (no layer below can serve a cached execution), and the
    # device-to-host fetch of the final scalar forces the whole chain to
    # really complete (block_until_ready alone does not synchronize
    # through remote-device tunnels).  Each trial RESTARTS from init on a
    # perturbed rhs: chaining one solve past ~20k iterations underflows
    # the f32 recurrence norm to exact zero and the next beta = 0/0 goes
    # NaN — a harness artifact, not a solver property (nu at 15k iters is
    # already ~1e-31).  A perturbed b keeps the trial's arguments
    # distinct so no cache layer can serve it.
    times = []
    for trial in range(8):
        s = init(op.data, b * (1.0 + 1e-6 * (trial + 1)))
        # drain init (and the rhs-scale kernel) with a host fetch BEFORE
        # the timer — dispatch is async, and block_until_ready does not
        # synchronize through the tunnel (PERF.md methodology rule 1)
        float(np.asarray(s["nu"]))
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            s = chunk(op.data, s)
        nu_final = float(np.asarray(s["nu"]))
        times.append(time.perf_counter() - t0)
        # stop once the two fastest trials agree within 5% (stable
        # window) after the minimum TRIALS count
        if len(times) >= TRIALS:
            t1, t2 = sorted(times)[:2]
            if t2 <= 1.05 * t1:
                break
    best = min(times)

    # sanity: the solve must actually be converging — a healthy 10k-iter
    # trial ends with nu tiny but strictly positive (NaN = divergence,
    # exact 0 = the underflow artifact this loop is built to avoid)
    assert np.isfinite(nu_final) and nu_final > 0, "diverged"

    ms_per_iter = best / (REPEATS * ITERS_PER_CHUNK) * 1e3
    print(
        json.dumps(
            {
                "metric": "pipe_pr_cg_time_per_iter_n650k_k32",
                "value": round(ms_per_iter, 4),
                "unit": "ms/iter",
                "vs_baseline": round(BASELINE_MS_PER_ITER / ms_per_iter, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
