"""Real-chip validation of the fused half-band kernels (round 5).

Compiles and numerically checks each ops/sym_fused.py kernel on the
actual Mosaic toolchain at a small-but-tileable size before any timing
or headline promotion — the round-2 lesson (a kernel that interprets
fine can still be rejected by the chip toolchain) made explicit.
Checks against the XLA mirror formulation computed ON THE SAME CHIP in
f32, so the comparison isolates kernel mechanics from dtype effects.

One device process.  Writes benchmarks/symdia_fused_check.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 16_384
K = 32
TILE = 4096


def main():
    import jax
    import jax.numpy as jnp

    from new_cg_variants_tpu.matio.problems import banded_model
    from new_cg_variants_tpu.ops import sym_fused as sf
    from new_cg_variants_tpu.solvers.precond import JacobiPreconditioner

    print("backend:", jax.default_backend(), flush=True)
    op, _, _ = banded_model(N, k=K, fmt="symdia")
    op = op.astype(jnp.float32)
    prec = JacobiPreconditioner.from_operator(op)
    rng = np.random.default_rng(0)
    vec = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal(N), jnp.float32)
    x, r, w, u, p, s, rt, st, wt, ut = [vec() for _ in range(10)]
    a1 = jnp.asarray(0.37, jnp.float32)
    beta = jnp.asarray(0.12, jnp.float32)

    mv = jax.jit(op._mv_xla)

    def rel(a_, b_):
        a_ = np.asarray(a_, np.float64)
        b_ = np.asarray(b_, np.float64)
        d = np.abs(a_ - b_).max()
        return float(d / max(np.abs(b_).max(), 1e-30))

    results = {}
    out = pathlib.Path(__file__).parent / "symdia_fused_check.json"

    def check(name, fn):
        try:
            errs = fn()
            results[name] = {"max_rel_err": max(errs)}
            status = "ok" if max(errs) < 2e-6 else "MISMATCH"
            print(f"{name}: {status} ({errs})", flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)[:500]}
            print(f"{name}: FAILED {e!r}", flush=True)
        out.write_text(json.dumps(results, indent=1))

    def chk_hs():
        p2 = r + beta * p
        s2 = mv(p2)
        fp, fs, (fmu,) = sf.fused_sym_hs_matvec_phase(
            op.offsets, op.data, r, p, beta, tile=TILE)
        return [rel(fp, p2), rel(fs, s2),
                rel(fmu, jnp.vdot(p2, s2))]

    def chk_pr():
        x2 = x + a1 * p
        r2 = r - a1 * s
        p2 = r2 + beta * p
        s2 = mv(p2)
        fx, fr, fp, fs, fd = sf.fused_sym_pr_full_step(
            op.offsets, op.data, x, r, p, s, a1, beta, tile=TILE)
        return [rel(fx, x2), rel(fs, s2), rel(fd[3], jnp.vdot(r2, r2))]

    def chk_pipe():
        r2 = r - a1 * s
        w2 = w - a1 * u
        s2 = w2 + beta * s
        p2 = r2 + beta * p
        u2 = mv(s2)
        w3 = mv(r2)
        fx, fr, fw, fp, fs, fu, fd = sf.fused_sym_pipe_full_step(
            op.offsets, op.data, x, r, w, u, p, s, a1, beta,
            recompute=True, tile=TILE)
        return [rel(fu, u2), rel(fw, w3), rel(fs, s2),
                rel(fd[0], jnp.vdot(p2, s2))]

    def chk_cgcg():
        r2 = r - a1 * s
        w2 = mv(r2)
        fx, fr, fw, fd = sf.fused_sym_cgcg_matvec_phase(
            op.offsets, op.data, x, r, p, s, a1, tile=TILE)
        return [rel(fw, w2), rel(fd[1], jnp.vdot(w2, r2))]

    def chk_gv():
        r2 = r - a1 * s
        w2 = w - a1 * u
        t = mv(w2)
        fx, fr, fw, ft, fd = sf.fused_sym_gv_matvec_phase(
            op.offsets, op.data, x, r, w, u, p, s, a1, tile=TILE)
        return [rel(ft, t), rel(fd[0], jnp.vdot(r2, r2))]

    def chk_pipe_prec():
        r2 = r - a1 * s
        w2 = w - a1 * u
        rt2 = rt - a1 * st
        wt2 = wt - a1 * ut
        p2 = rt2 + beta * p
        s2 = w2 + beta * s
        st2 = wt2 + beta * st
        u2 = mv(st2)
        w3 = mv(rt2)
        outs = sf.fused_sym_pipe_full_step_prec(
            op.offsets, op.data, prec.inv_diag, x, r, w, u, p, s,
            rt, st, wt, ut, a1, beta, recompute=True, tile=TILE)
        fx, fr, fw, fp, fs, fu, frt, fst, fwt, fut, fd = outs
        return [rel(fu, u2), rel(fw, w3), rel(fut, prec.inv_diag * u2),
                rel(fd[1], jnp.vdot(r2, st2))]

    def chk_pr_prec():
        r2 = r - a1 * s
        rt2 = rt - a1 * st
        p2 = rt2 + beta * p
        s2 = mv(p2)
        st2 = prec.inv_diag * s2
        fx, fr, frt, fp, fs, fst, fd = sf.fused_sym_pr_full_step_prec(
            op.offsets, op.data, prec.inv_diag, x, r, p, s, rt, st,
            a1, beta, tile=TILE)
        return [rel(fs, s2), rel(fst, st2), rel(fd[2], jnp.vdot(st2, s2))]

    check("hs", chk_hs)
    check("pr", chk_pr)
    check("pipe", chk_pipe)
    check("cgcg", chk_cgcg)
    check("gv", chk_gv)
    check("pipe_prec", chk_pipe_prec)
    check("pr_prec", chk_pr_prec)
    print("done ->", out, flush=True)


if __name__ == "__main__":
    main()
