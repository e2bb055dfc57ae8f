"""Measured practical HBM ceiling for the roofline denominator.

The PERF.md roofline used the v5e's 819 GB/s spec number; no real kernel
reaches spec.  This measures what XLA sustains on this chip through the
same access shapes the solver uses:

1. READ:  square-sum of the (ndiags, n) DIA data array (one full read,
   scalar out) — the matrix stream of the SpMV.
2. READ+WRITE: elementwise scale of the same array — the stream shape
   of the vector phase.

Both chained through an evolving scalar so no layer can serve a cached
execution (PERF.md timing methodology).  Writes benchmarks/hbm_ceiling.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 651_264
NDIAGS = 63  # headline shape: k=32 banded minus the 2 clipped corners
ITERS = 200
OUT = pathlib.Path(__file__).parent / "hbm_ceiling.json"


def main():
    import jax
    import jax.numpy as jnp

    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((NDIAGS, N)), jnp.float32
    )
    nbytes = data.size * 4

    @jax.jit
    def read_chain(data, s):
        def body(_, s):
            # depends on s (no hoisting) but adds ~1 scalar op per element
            d = data + s * 1e-30
            return s * 0.5 + jnp.vdot(d.ravel(), d.ravel()) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, s)

    @jax.jit
    def rw_chain(data, s):
        def body(_, carry):
            d, s = carry
            d = d * (1.0 + s * 1e-30)
            return d, s * 0.5 + d[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, (data, s))[1]

    results = {"n": N, "ndiags": NDIAGS, "array_mb": nbytes / 1e6,
               "iters": ITERS}
    for name, fn, traffic in [
        ("read", read_chain, nbytes),
        ("read_write", rw_chain, 2 * nbytes),
    ]:
        s = jnp.float32(1.0)
        s = fn(data, s)
        float(np.asarray(s))  # drain compile+exec through the tunnel
        t0 = time.perf_counter()
        s = fn(data, s)
        float(np.asarray(s))
        dt = time.perf_counter() - t0
        gbs = traffic * ITERS / dt / 1e9
        results[name] = {"ms_per_pass": dt / ITERS * 1e3, "gbytes_per_s": gbs}
        print(f"{name:>10s}: {dt/ITERS*1e3:.4f} ms/pass, {gbs:.0f} GB/s",
              flush=True)

    OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
