"""Fused vector-phase Pallas kernel for the pipelined PR families.

One pipe-PR iteration (unpreconditioned) splits into

1. the VECTOR PHASE: 5 AXPY-class updates (x, r, w, p, s) plus the 4
   local dot partials (mu, delta, gamma, nu) of the single sync phase —
   the ``8x VecAXPY`` + ``VecMDot`` block of the PETSc implementation
   (``cg_impls/pipeprcg.c:145-158``);
2. the MATVEC PHASE: the fused 2-RHS SpMV (:mod:`.spmv_pallas`).

XLA fuses the elementwise updates well but materializes intermediates
between fusion islands and re-reads inputs for each reduce.  This kernel
makes the vector phase ONE pass: read x, r, w, u, p, s (+2 scalars),
write the 5 updated vectors and per-tile dot partials (summed by XLA
afterwards — a (tiles, 4) reduction, microseconds).

Scalar order in/out matches :func:`fused_pipe_vector_phase`'s docstring;
the caller (``families.make_pipe_step`` via the context) computes
alpha/beta on scalars as usual — only the O(n) work moves in here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_pipe_vector_phase", "supports_fused"]

DEFAULT_TILE = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_fused(n: int, tile: int = DEFAULT_TILE) -> bool:
    return n >= 1  # any size (padding handles raggedness)


def _kernel(tile, x_ref, r_ref, w_ref, u_ref, p_ref, s_ref, ab_ref,
            x_o, r_o, w_o, p_o, s_o, dots_o):
    import jax.experimental.pallas as pl

    a1 = ab_ref[0]
    beta = ab_ref[1]
    x = x_ref[:] + a1 * p_ref[:]
    r = r_ref[:] - a1 * s_ref[:]
    w = w_ref[:] - a1 * u_ref[:]
    p = r + beta * p_ref[:]  # rt = r (unpreconditioned)
    s = w + beta * s_ref[:]
    x_o[:] = x
    r_o[:] = r
    w_o[:] = w
    p_o[:] = p
    s_o[:] = s
    # Local dot partials of the single sync phase, accumulated across the
    # (sequential) TPU grid into one full-array VMEM (4, 128) output —
    # per-tile blocked outputs of shape (1, 4) violate the Mosaic (8, 128)
    # tiling rule, and scalar SMEM accumulation serializes the pipeline;
    # a revisited lane-wise vector accumulator does neither.  Final
    # cross-lane reduction happens outside the kernel (4x128, trivial).
    # mu = p.s, delta = r.st (= r.s), gamma = st.s (= s.s), nu = rt.r (= r.r)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dots_o[...] = jnp.zeros_like(dots_o)

    def lanes(prod):
        return jnp.sum(prod.reshape(-1, 128), axis=0)

    dots_o[...] += jnp.stack(
        [lanes(p * s), lanes(r * s), lanes(s * s), lanes(r * r)]
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_pipe_vector_phase(x, r, w, u, p, s, a1, beta, *,
                            tile=DEFAULT_TILE, interpret=None):
    """Unpreconditioned pipe-P/PR vector phase, one pass.

    Returns ``(x2, r2, w2, p2, s2, (mu, delta, gamma, nu))`` where the
    dot values are LOCAL (un-psummed) partials over these arrays —
    identical semantics to forming them with ``jnp.vdot`` on the updated
    vectors.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = x.shape[0]
    n_pad = _round_up(n, tile)
    pad = n_pad - n

    def pad1(v):
        return jnp.pad(v, (0, pad)) if pad else v

    ab = jnp.stack([a1, beta]).astype(x.dtype)
    grid = (n_pad // tile,)
    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, tile),
        grid=grid,
        in_specs=[vec_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[vec_spec] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad,), x.dtype)] * 5
        + [jax.ShapeDtypeStruct((4, 128), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=18 * n_pad,
            bytes_accessed=11 * n_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pad1(x), pad1(r), pad1(w), pad1(u), pad1(p), pad1(s), ab)
    x2, r2, w2, p2, s2, lanes = outs
    dots = jnp.sum(lanes, axis=1)
    if pad:
        x2, r2, w2, p2, s2 = (v[:n] for v in (x2, r2, w2, p2, s2))
    return x2, r2, w2, p2, s2, (dots[0], dots[1], dots[2], dots[3])
