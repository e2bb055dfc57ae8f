"""Headline benchmark: pipe-PR-CG time/iteration on the PETSc model problem.

Reproduces the reference's strong-scaling headline configuration on one
TPU chip: the k-banded model problem with n = 650,000, k = 32 (65
diagonals), rho = 0.95, kappa = 1e6, no preconditioner, fixed iteration
count (``scaling_experiments_petsc/strong_scaling_tests.py:119-134``,
``ex2a.c:77-95``) solved with the pipelined predict-and-recompute CG
variant (``cg_impls/pipeprcg.c``).

Storage: SYMMETRIC HALF-BAND (``ops/sym_dia.py``) with the fused
whole-iteration half-band kernel (``ops/sym_fused.py``) — the
framework's production formulation for SPD matrices since round 5
(PETSc's hot loop likewise always runs its best formulation,
``cg_impls/pipeprcg.c:145-173``).  The matrix is stored in full
(main + upper diagonals, every nonzero value materialized); storing
one triangle of a symmetric matrix is standard practice the reference
itself uses on disk (its ``.mtx`` fixtures are ``symmetric``-format).
If the half-band path fails for any reason the benchmark falls back to
the two-triangle DIA formulation (round 4's headline) rather than
failing the run.

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
# best-measured kernel tile (+0.82%; benchmarks/tile_scan.json), so no
# per-call pad copy on the kernel fast path.  The extra 0.8% rows make
# the comparison conservative (per-iteration cost is linear in n).
N = 655_360
K_BAND = 32
# 2 x 5000 chained iterations: per-dispatch tunnel latency (can be
# seconds, fluctuating) amortizes to <0.05 ms/iter of noise.  The timed
# region is additionally repeated TRIALS times and the minimum taken —
# the reference's own reduction (scaling_plots.py:53) and the only
# robust stance against the tunnel's occasional multi-second stalls.
ITERS_PER_CHUNK = 5000
REPEATS = 2
TRIALS = 3
BASELINE_MS_PER_ITER = 46.77 / 4000 * 1000  # PETSc pipeprcg, 1 node, min over trials


def _measure(op_builder):
    """Warm + time the pipe-PR iteration chunks for one formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    op, b = op_builder()
    init_fn, step_fn = FAMILIES["pipe_pr"]

    @jax.jit
    def init(data, b):
        ctx = Context(type(op)(op.offsets, data), None)
        return init_fn(ctx, b, jnp.zeros_like(b))

    @jax.jit
    def chunk(data, state):
        ctx = Context(type(op)(op.offsets, data), None)
        state = jax.lax.fori_loop(
            0, ITERS_PER_CHUNK, lambda _, s: step_fn(ctx, s), state
        )
        return state

    # Warmup: compile + execute both programs.  The host fetch (not just
    # block_until_ready) is what drains compile+execution through the
    # remote-device tunnel before the timer starts.
    state = init(op.data, b)
    state = chunk(op.data, state)
    float(np.asarray(state["nu"]))

    # Time REPEATS chained chunks per trial: every call sees a distinct
    # input state, and the device-to-host fetch of the final scalar
    # forces the whole chain to complete.  Each trial RESTARTS from init
    # on a perturbed rhs (PERF.md methodology: chaining one solve past
    # ~20k iterations underflows the f32 recurrence norm).
    times = []
    nu_final = float("nan")
    for trial in range(8):
        s = init(op.data, b * (1.0 + 1e-6 * (trial + 1)))
        float(np.asarray(s["nu"]))  # drain init before the timer
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
    # exact 0 = the underflow artifact the restarts avoid)
    assert np.isfinite(nu_final) and nu_final > 0, "diverged"
    return best / (REPEATS * ITERS_PER_CHUNK) * 1e3


def _build_symdia():
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model

    op64, b, _ = banded_model(N, k=K_BAND, fmt="symdia")
    op = op64.astype(jnp.float32)
    return op, jnp.asarray(np.asarray(b), jnp.float32)


def _build_dia():
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model

    op64, b, _ = banded_model(N, k=K_BAND)
    op = op64.astype(jnp.float32)
    return op, jnp.asarray(np.asarray(b), jnp.float32)


def main():
    import sys

    formulation = "symdia"
    try:
        ms_per_iter = _measure(_build_symdia)
    except Exception as e:  # never fail the driver run on the fast path
        print(f"symdia formulation failed ({e!r}); "
              "falling back to two-triangle DIA", file=sys.stderr)
        formulation = "dia_fallback"
        ms_per_iter = _measure(_build_dia)

    print(
        json.dumps(
            {
                "metric": "pipe_pr_cg_time_per_iter_n650k_k32",
                "value": round(ms_per_iter, 4),
                "unit": "ms/iter",
                "vs_baseline": round(BASELINE_MS_PER_ITER / ms_per_iter, 2),
                # which storage produced the number — a fallback run must
                # be distinguishable in round-over-round comparisons
                "formulation": formulation,
            }
        )
    )


if __name__ == "__main__":
    main()
