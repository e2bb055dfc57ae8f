"""Pallas DMA read ceiling: the kernel-honest roofline denominator.

The XLA elementwise stream sustains ~470-515 GB/s on this chip
(hbm_ceiling.json) — but Mosaic's double-buffered block DMA does better,
and the fused full-step's effective rate (~610 GB/s) already exceeds the
XLA stream.  This times a Pallas kernel with the EXACT input block
pattern of the full-step kernel ((ndiags, tile) matrix blocks over a
(nt,) grid) doing only a per-block reduction: the measured ceiling for
"one pass over the DIA data", i.e. the denominator for the full-step
kernel's percent-of-speed-of-light claim.  The evolving chain scalar
enters the kernel through SMEM (so no layer can hoist or cache the call)
without adding any array traffic: each pass is exactly ONE read of the
array.  Writes benchmarks/pallas_ceiling.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 651_264
NDIAGS = 63
ITERS = 500
OUT = pathlib.Path(__file__).parent / "pallas_ceiling.json"


def make_pass(tile):
    import jax
    import jax.experimental.pallas as pl
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def kernel(d_ref, s_ref, o_ref):
        acc = jnp.sum(d_ref[:].reshape(-1, 128), axis=0)
        o_ref[0] = (acc * (1.0 + s_ref[0]))[None]

    nt = N // tile

    @jax.jit
    def one_pass(data, s):
        def body(_, s):
            out = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((NDIAGS, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nt, 1, 128), data.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
                ),
            )(data, s[None] * 1e-30)
            return s * 0.5 + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, s)

    return one_pass


def main():
    import jax.numpy as jnp

    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((NDIAGS, N)), jnp.float32
    )
    nbytes = data.size * 4
    results = {"n": N, "ndiags": NDIAGS, "array_mb": nbytes / 1e6,
               "iters": ITERS}
    for tile in (2048, 4096):
        fn = make_pass(tile)
        s = jnp.float32(1.0)
        s = fn(data, s)
        float(np.asarray(s))
        t0 = time.perf_counter()
        s = fn(data, s)
        float(np.asarray(s))
        dt = time.perf_counter() - t0
        ms = dt / ITERS * 1e3
        gbs = nbytes / (dt / ITERS) / 1e9
        results[f"tile_{tile}"] = {"ms_per_pass": ms, "gbytes_per_s": gbs}
        print(f"tile {tile}: {ms:.4f} ms/pass, {gbs:.0f} GB/s", flush=True)
    OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
