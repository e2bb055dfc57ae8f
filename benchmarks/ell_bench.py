"""On-chip throughput of the general-sparse (ELL) path.

Two subjects (VERDICT r1 #6: "on-chip nnz/s for one large general
matrix recorded"):

1. ``bcsstk18`` — the largest general fixture the reference ships
   (n = 11,948, ~149k stored nnz): the honest real-matrix number.
2. A synthetic locality-structured general matrix at TPU scale
   (n = 524,288, 32 nnz/row, bandwidth-limited random pattern —
   the sparsity class of the reference's mpiaij experiments): shows
   what the XLA gather formulation sustains when n is big enough to
   amortize dispatch.

Timed through the same chained fixed-iteration harness as the suite
(``run_all.time_fixed_iters``) with hs_cg (1 matvec/iter) and
pipe_pr_cg (2 matvecs/iter, fused 2-RHS gather).  Writes
``benchmarks/ell_results.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from benchmarks.run_all import time_fixed_iters  # noqa: E402


def synthetic_ell(n, L, bandwidth, seed=0, dtype=None):
    import jax.numpy as jnp

    from new_cg_variants_tpu.ops.operators import EllOperator

    rng = np.random.default_rng(seed)
    i = np.arange(n)[:, None]
    lo = np.maximum(0, i - bandwidth)
    hi = np.minimum(n, i + bandwidth + 1)
    idx = (lo + rng.random((n, L)) * (hi - lo)).astype(np.int32)
    idx[:, -1] = np.arange(n)  # diagonal slot
    val = (rng.standard_normal((n, L)) * 0.05).astype(np.float32)
    val[:, -1] = L + 1.0  # diagonally dominant SPD-ish
    return EllOperator(jnp.asarray(val, dtype=dtype), jnp.asarray(idx), n * L)


OUT = pathlib.Path(__file__).parent / "ell_results.json"

#: sustained XLA-gather rate on this chip (measured, PERF.md) and the
#: longest single dispatch the tunnel's worker tolerates.  A fori_loop
#: chunk whose estimated device time exceeds the watchdog kills the TPU
#: worker process ("UNAVAILABLE: TPU worker process crashed"), so the
#: harness refuses to launch one instead of crashing the queue: the
#: round-2 fault (chip_queue.log) was a 524288x32x1000-iter gather chunk
#: = ~7 min of device time in ONE dispatch.
GATHER_ELEMS_PER_S = 40e6
DISPATCH_BUDGET_S = 60.0


def safe_iters(op, iters, matvecs_per_iter=2):
    """Cap chunk length so one dispatch stays under the worker watchdog.

    The rate model is formulation-aware: the 40M elem/s figure is the
    measured XLA *gather* rate and applies to :class:`EllOperator` only;
    block-banded is MXU batched-matmul (orders of magnitude faster per
    stored value) and is modeled at its measured ~1 Tflop/s-class padded
    throughput so the guard doesn't spuriously shorten its chunks.
    """
    from new_cg_variants_tpu.ops.block_banded import (
        BlockBandedOperator,
        PermutedBlockBandedOperator,
    )
    from new_cg_variants_tpu.ops.operators import EllOperator

    if isinstance(op, PermutedBlockBandedOperator):
        op = op.inner
    if isinstance(op, EllOperator):
        elems_per_s = GATHER_ELEMS_PER_S
        work = op.nnz
    elif isinstance(op, BlockBandedOperator):
        # padded MACs per matvec at a conservative MXU rate
        elems_per_s = 5e11
        work = int(np.prod(op.a_blk.shape))
    else:  # DIA/stencil: HBM-bound, ~1e11 values/s at the measured ceiling
        elems_per_s = 1e11
        work = op.nnz
    est_s = work * matvecs_per_iter * iters / elems_per_s
    if est_s <= DISPATCH_BUDGET_S:
        return iters
    capped = max(1, int(iters * DISPATCH_BUDGET_S / est_s))
    print(f"  [guard] {iters} iters/chunk ~{est_s:.0f}s device time "
          f"> {DISPATCH_BUDGET_S:.0f}s watchdog budget -> {capped}",
          flush=True)
    return capped


def measure(tag, op, b, variants, iters, results):
    for variant, mm in variants:
        try:
            t_iter, _ = time_fixed_iters(variant, op, b,
                                         safe_iters(op, iters, mm))
        except Exception as e:  # record the failure, keep the suite going
            results[tag][variant] = {"error": repr(e)[:200]}
            print(f"{tag}/{variant}: FAILED {e!r}", flush=True)
            OUT.write_text(json.dumps(results, indent=1))
            continue
        nnz_s = op.nnz * mm / t_iter
        results[tag][variant] = {
            "ms_per_iter": t_iter * 1e3,
            "nnz_per_s": nnz_s,
            # gather traffic model: val + idx + gathered vector bytes
            "gather_gbytes_per_s": (op.nnz * mm * (4 + 4 + 4)) / t_iter / 1e9,
        }
        print(f"{tag}/{variant}: {t_iter*1e3:.3f} ms/iter, "
              f"{nnz_s/1e9:.2f} Gnnz/s", flush=True)
        OUT.write_text(json.dumps(results, indent=1))


def main():
    import jax
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.ops.operators import from_coo
    from new_cg_variants_tpu.utils.env_info import env_info

    dtype = jnp.float32
    results = {"env": env_info()}

    # 1. real fixture
    coo = cgt.load_matrix("bcsstk18")
    op = from_coo(coo, fmt="ell", dtype=dtype)
    n = op.n
    x_true = np.ones(n) / np.sqrt(n)
    b = jnp.asarray(coo.tocsr() @ x_true, dtype=dtype)
    results["bcsstk18"] = {"n": n, "nnz": op.nnz, "L": int(op.val.shape[1])}
    measure("bcsstk18", op, b, [("hs_cg", 1), ("pipe_pr_cg", 2)], 2000,
            results)

    # 2. synthetic at moderate scale.  CAUTION: the XLA gather runs
    #    ~40M elem/s, so one fori_loop chunk must stay well under the
    #    device watchdog — n=131k, L=16, 50 iters/chunk ≈ 5 s/chunk
    #    (a 524k x 32 x 1000-iter chunk crashed the TPU worker).
    n2, L2 = 131_072, 16
    op2 = synthetic_ell(n2, L2, bandwidth=8_192, dtype=dtype)
    b2 = jnp.asarray(np.random.default_rng(1).standard_normal(n2), dtype=dtype)
    results["synthetic_131k_L16"] = {"n": n2, "nnz": op2.nnz, "L": L2}
    measure("synthetic_131k_L16", op2, b2, [("hs_cg", 1)], 50, results)

    # 2b. crash diagnosis (VERDICT r2 #7): the EXACT shape that killed
    #     the TPU worker in round 2 (n=524288, L=32) — but chunked under
    #     the dispatch budget by safe_iters.  Completing here proves the
    #     fault was single-dispatch duration (worker watchdog), not the
    #     gather's index layout at that shape.
    n3, L3 = 524_288, 32
    op4 = synthetic_ell(n3, L3, bandwidth=16_384, seed=2, dtype=dtype)
    b4 = jnp.asarray(np.random.default_rng(3).standard_normal(n3), dtype=dtype)
    results["synthetic_524k_L32"] = {"n": n3, "nnz": op4.nnz, "L": L3}
    measure("synthetic_524k_L32", op4, b4, [("hs_cg", 1)], 50, results)

    # 3. the MXU answer: block-banded packing of the SAME general
    #    matrix (RCM reorder + block-tridiagonal batched matmul,
    #    ops/block_banded.py) — vs arm 1's gather formulation
    from new_cg_variants_tpu.ops.block_banded import block_banded_from_coo

    op3, perm = block_banded_from_coo(coo, dtype=dtype)
    b3 = np.zeros(op3.n, dtype=np.float32)
    b3[: op3.n_orig] = np.asarray(coo.tocsr() @ x_true)[perm]
    b3 = jnp.asarray(b3, dtype=dtype)
    results["bcsstk18_block_banded"] = {
        "n": op3.n, "n_orig": op3.n_orig, "bs": op3.bs, "nnz": op3.nnz,
        "padded_values": int(np.prod(op3.a_blk.shape)),
    }
    measure("bcsstk18_block_banded", op3, b3,
            [("hs_cg", 1), ("pipe_pr_cg", 2)], 2000, results)

    # 4. the AUTO route (VERDICT r3 task 6): from_coo(fmt='auto') must
    #    land bcsstk18 on the block-banded fast path TRANSPARENTLY
    #    (original coordinates — same b as the gather arm)
    op5 = from_coo(coo, fmt="auto", dtype=dtype)
    results["bcsstk18_auto"] = {"routed_to": type(op5).__name__, "n": op5.n}
    measure("bcsstk18_auto", op5, b,
            [("hs_cg", 1), ("pipe_pr_cg", 2)], 2000, results)

    OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
