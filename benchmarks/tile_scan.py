"""On-chip tile scan for the fused full-step kernel.

Times the headline pipe-PR fused iteration at several kernel tiles on a
common n divisible by all of them (655360 = 160*4096 = 80*8192 =
40*16384; +0.8% vs the PETSc mesh_pts=650000).  One device process,
serial arms, PERF.md timing methodology (chained chunks, host fetch).

Usage: python benchmarks/tile_scan.py [tile ...]
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 655_360
K_BAND = 32
ITERS = 5000
REPEATS = 2


def time_tile(tile: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops.operators import DiaOperator
    from new_cg_variants_tpu.solvers.context import Context
    from new_cg_variants_tpu.solvers.families import FAMILIES

    os.environ["NCGV_FUSED_TILE"] = str(tile)
    os.environ["NCGV_FULL_FUSED"] = "1"

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
    print(f"  [tile={tile}] warmup+compile {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    s = state
    for _ in range(REPEATS):
        s = chunk(op.data, s)
    nu = float(np.asarray(s["nu"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(nu)
    ms = dt / (REPEATS * ITERS) * 1e3
    print(f"  [tile={tile}] {ms:.4f} ms/iter", flush=True)
    return ms


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    results = {}
    for t in tiles:
        assert N % t == 0 and N // t >= 2
        results[str(t)] = time_tile(t)
    out = pathlib.Path(__file__).parent / "tile_scan.json"
    out.write_text(json.dumps({"n": N, "k": K_BAND, "ms_per_iter": results},
                              indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
