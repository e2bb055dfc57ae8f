"""CG variant families: init/step bodies.

Five families cover the full 20-variant surface of the reference
(``numerical_experiments/cg_variants/__init__.py:64-74``):

========  ==========================================================
family    variants
========  ==========================================================
hs        hs_cg, hs_pcg                       (2 syncs/iter)
cgcg      cg_cg, cg_pcg                       (1 fused 2-dot sync)
gv        gv_cg, gv_pcg                       (1 sync, SpMV overlap)
pr        pr_cg, m_cg, pr_pcg, m_pcg          (1 fused 4-dot sync)
pipe      pipe_{p,pr,p_m,pr_m}_{cg,pcg}       (1 sync; SpMVs overlap)
========  ==========================================================

Each family is a pair of pure functions ``init(ctx, b, x0) -> state`` and
``step(ctx, state) -> state`` over a dict state, written against the
:class:`~.context.Context` interface so the same body runs single-device
or under ``shard_map``.  Math follows Chen & Carson (arXiv:1905.01549);
update *order* matters for finite-precision parity with the reference
(e.g. beta from the predicted nu but alpha from the recomputed nu —
``numerical_experiments/cg_variants/pipe_pr_cg.py:63-76``), so each step
preserves it exactly.

Scalar state keys carried for observability: ``a`` (alpha_k), ``a1``
(alpha_{k-1}), ``b`` (beta_k), ``b1``, ``nu``; families add their own
(``mu``, ``eta``, ``delta``, ``gamma``).  Preconditioned runs carry the
tilde vectors (``rt``, ``st``, ...); unpreconditioned runs omit them
entirely (no dead 2x memory traffic when M = I).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["FAMILIES", "family_of", "make_gv_step"]


def _safe_div(num, den):
    """``num / den``, but 0 when ``den`` is exactly 0 — the
    post-convergence stagnation guard.

    The recurrence residual decays geometrically past the attainable
    floor, so a long fixed-iteration f32 solve underflows ``nu`` (and its
    siblings) to exact zero around ~20k iterations; the next
    ``beta = 0/0`` would poison the whole state with NaN.  PETSc never
    reaches that point because its convergence test breaks the loop
    (``cg_impls/pipeprcg.c:112-136``); the fixed-iteration analog is to
    FREEZE: with every alpha/beta formed through this guard, an exact
    zero denominator yields alpha = beta = 0 and the iterate x stops
    moving while staying finite.  For nonzero denominators the quotient
    is bit-identical to the plain division.
    """
    from ..ops.doublefloat import DF, df_safe_div

    if isinstance(num, DF) or isinstance(den, DF):
        return df_safe_div(num, den)
    safe = jnp.where(den != 0, den, jnp.ones_like(den))
    return jnp.where(den != 0, num / safe, jnp.zeros_like(num))


def _common_scalars(nu, mu, dtype):
    # zero scalars built LIKE nu so the loop-carry structure is stable
    # for any scalar representation (plain array or double-float pair)
    zero = jax.tree.map(jnp.zeros_like, nu)
    return dict(
        nu=nu, mu=mu, a=_safe_div(nu, mu), a1=zero, a2=zero, b=zero, b1=zero,
        k=jnp.zeros((), jnp.int32),
    )


def _rotate(s, new):
    """Shift the alpha/beta index window by one iteration."""
    new["a2"] = s["a1"]
    new["a1"] = s["a"]
    new["b1"] = s["b"]
    new["k"] = s["k"] + 1
    return new


def _norm_pair(ctx, r, rt):
    """Optional extra pair for the sync batch: the convergence norm.

    ``ctx.extra_norm`` is set by :func:`~.engine.tolerance_loop` for
    preconditioned solves with ``norm_type='unpreconditioned'`` (needs
    ``r.r``) or ``'preconditioned'`` (needs ``rt.rt``) — the extra scalar
    rides the family's EXISTING fused reduction, so norm-checked solves
    keep one sync per iteration like PETSc, which derives its norms from
    the same reduction batch (``cg_impls/pipeprcg.c:112-136``).
    Unpreconditioned runs never need it: there ``nu = r.r`` already.
    """
    en = getattr(ctx, "extra_norm", None)
    if en is None:
        return ()
    v = r if en == "r" else rt
    return ((v, v),)


# ---------------------------------------------------------------------------
# Hestenes–Stiefel (classic) CG — cf. numerical_experiments/cg_variants/hs_cg.py
# ---------------------------------------------------------------------------


def hs_init(ctx, b, x0):
    x = x0
    r = b - ctx.mv(x)
    rt = ctx.prec(r)
    p = rt
    (nu,) = ctx.dots((r, rt))
    s = ctx.mv(p)
    (mu,) = ctx.dots((p, s))
    st = dict(x=x, r=r, p=p, s=s, **_common_scalars(nu, mu, b.dtype))
    if ctx.has_prec:
        st["rt"] = rt
    return st


def hs_step(ctx, s_):
    a1 = s_["a"]
    x = s_["x"] + a1 * s_["p"]
    r = s_["r"] - a1 * s_["s"]
    rt = ctx.prec(r)
    extra = _norm_pair(ctx, r, rt)
    out = ctx.dots((r, rt), *extra)  # sync 1
    nu = out[0]
    beta = _safe_div(nu, s_["nu"])
    # second sync phase fused (p update + SpMV + mu partial in one Pallas
    # pass) when the context/operator qualifies — cf. the always-fused
    # PETSc hot loop (cg_impls/cg.c); update order identical.  The phase
    # never touches M, so it serves hs_pcg (rt input) too.
    fused = None
    if not extra:
        hook = getattr(ctx, "hs_matvec_phase", None)
        fused = hook(rt, s_["p"], beta) if hook is not None else None
    if fused is not None:
        p, s, (mu,) = fused
    else:
        p = rt + beta * s_["p"]
        s = ctx.mv(p)
        (mu,) = ctx.dots((p, s))  # sync 2
    new = dict(x=x, r=r, p=p, s=s, nu=nu, mu=mu, a=_safe_div(nu, mu), b=beta)
    if extra:
        new["rho"] = out[-1]
    if ctx.has_prec:
        new["rt"] = rt
    return _rotate(s_, new)


# ---------------------------------------------------------------------------
# Chronopoulos–Gear two-term-recurrence CG — cf. cg_variants/cg_cg.py
# ---------------------------------------------------------------------------


def cgcg_init(ctx, b, x0):
    x = x0
    r = b - ctx.mv(x)
    rt = ctx.prec(r)
    w = ctx.mv(rt)
    p = rt
    nu, eta = ctx.dots((r, rt), (w, rt))
    s = ctx.mv(p)
    (mu,) = ctx.dots((p, s))
    st = dict(x=x, r=r, w=w, p=p, s=s, eta=eta, **_common_scalars(nu, mu, b.dtype))
    if ctx.has_prec:
        st["rt"] = rt
    return st


def cgcg_step(ctx, s_):
    a1 = s_["a"]
    if getattr(ctx, "extra_norm", None) is None:
        # fused phase: x,r updates + (PCApply +) w = A rt + the single
        # sync's nu,eta partials in one Pallas pass; only the p,s AXPYs
        # (need beta) stay in XLA.  Update order identical to the
        # generic body.
        if not ctx.has_prec:
            hook = getattr(ctx, "cgcg_matvec_phase", None)
            fused = hook(s_, a1) if hook is not None else None
            if fused is not None:
                x, r, w, (nu, eta) = fused
                beta = _safe_div(nu, s_["nu"])
                p = r + beta * s_["p"]  # rt = r (unpreconditioned)
                s = w + beta * s_["s"]
                mu = eta - _safe_div(beta, a1) * nu
                new = dict(x=x, r=r, w=w, p=p, s=s, nu=nu, eta=eta, mu=mu,
                           a=_safe_div(nu, mu), b=beta)
                return _rotate(s_, new)
        else:
            hook = getattr(ctx, "cgcg_matvec_phase_prec", None)
            fused = hook(s_, a1) if hook is not None else None
            if fused is not None:
                x, r, rt, w, (nu, eta) = fused
                beta = _safe_div(nu, s_["nu"])
                p = rt + beta * s_["p"]
                s = w + beta * s_["s"]
                mu = eta - _safe_div(beta, a1) * nu
                new = dict(x=x, r=r, w=w, p=p, s=s, nu=nu, eta=eta, mu=mu,
                           a=_safe_div(nu, mu), b=beta, rt=rt)
                return _rotate(s_, new)
    x = s_["x"] + a1 * s_["p"]
    r = s_["r"] - a1 * s_["s"]
    rt = ctx.prec(r)
    w = ctx.mv(rt)
    extra = _norm_pair(ctx, r, rt)
    out = ctx.dots((r, rt), (w, rt), *extra)  # the single fused sync
    nu, eta = out[0], out[1]
    beta = _safe_div(nu, s_["nu"])
    p = rt + beta * s_["p"]
    s = w + beta * s_["s"]
    mu = eta - _safe_div(beta, a1) * nu  # scalar recurrence replaces the mu dot
    new = dict(x=x, r=r, w=w, p=p, s=s, nu=nu, eta=eta, mu=mu, a=_safe_div(nu, mu), b=beta)
    if extra:
        new["rho"] = out[-1]
    if ctx.has_prec:
        new["rt"] = rt
    return _rotate(s_, new)


# ---------------------------------------------------------------------------
# Ghysels–Vanroose pipelined CG — cf. cg_variants/gv_cg.py
# ---------------------------------------------------------------------------


def gv_init(ctx, b, x0):
    x = x0
    r = b - ctx.mv(x)
    rt = ctx.prec(r)
    w = ctx.mv(rt)
    wt = ctx.prec(w)
    p = rt
    s = w
    st_ = wt
    u = ctx.mv(wt)
    nu, eta = ctx.dots((r, rt), (w, rt))
    (mu,) = ctx.dots((p, s))
    state = dict(
        x=x, r=r, w=w, p=p, s=s, u=u, eta=eta, **_common_scalars(nu, mu, b.dtype)
    )
    if ctx.has_prec:
        state.update(rt=rt, wt=wt, st=st_)
    return state


def make_gv_step(w_replace=None, stateful=False):
    """GV step factory with optional residual-replacement hook.

    ``w_replace(k, state_view) -> bool`` (traceable) forces
    ``w = A rt`` at iterations where it returns True — the reference's
    ``w_replace``/``wk_replace_flags`` mechanism (``gv_cg.py:69-72``).
    (The reference's preconditioned twin replaces with ``A r``; we use the
    mathematically consistent ``A rt``, identical when M = I.)

    With ``stateful=True`` the hook threads its own state across
    iterations — ``w_replace(k, state_view, rep_state) -> (bool,
    new_rep_state)`` — carried as the ``wrep`` pytree leaf of the solver
    state (the reference's mutable ``wk_replace_flags`` dict,
    ``gv_cg.py:40,69-72``), so adaptive policies that depend on their own
    replacement history are expressible inside the compiled loop.
    """

    def gv_step(ctx, s_):
        a1 = s_["a"]
        if w_replace is None and getattr(ctx, "extra_norm", None) is None:
            # fused phase: x,r,w updates + (PCApply +) t = A wt + nu,eta
            # partials in one Pallas pass; p,s,u(,st) AXPYs (need beta)
            # stay in XLA.
            if not ctx.has_prec:
                hook = getattr(ctx, "gv_matvec_phase", None)
                fused = hook(s_, a1) if hook is not None else None
                if fused is not None:
                    x, r, w, t, (nu, eta) = fused
                    beta = _safe_div(nu, s_["nu"])
                    p = r + beta * s_["p"]  # rt = r (unpreconditioned)
                    s = w + beta * s_["s"]
                    u = t + beta * s_["u"]
                    mu = eta - _safe_div(beta, a1) * nu
                    new = dict(x=x, r=r, w=w, p=p, s=s, u=u, nu=nu,
                               eta=eta, mu=mu, a=_safe_div(nu, mu), b=beta)
                    return _rotate(s_, new)
            else:
                hook = getattr(ctx, "gv_matvec_phase_prec", None)
                fused = hook(s_, a1) if hook is not None else None
                if fused is not None:
                    x, r, rt, w, wt, t, (nu, eta) = fused
                    beta = _safe_div(nu, s_["nu"])
                    p = rt + beta * s_["p"]
                    s = w + beta * s_["s"]
                    u = t + beta * s_["u"]
                    st = wt + beta * s_["st"]
                    mu = eta - _safe_div(beta, a1) * nu
                    new = dict(x=x, r=r, w=w, p=p, s=s, u=u, nu=nu,
                               eta=eta, mu=mu, a=_safe_div(nu, mu), b=beta,
                               rt=rt, wt=wt, st=st)
                    return _rotate(s_, new)
        x = s_["x"] + a1 * s_["p"]
        r = s_["r"] - a1 * s_["s"]
        if ctx.has_prec:
            rt = s_["rt"] - a1 * s_["st"]
        else:
            rt = r
        w = s_["w"] - a1 * s_["u"]
        new_wrep = None
        if w_replace is not None:
            view = dict(k=s_["k"] + 1, x=x, r=r, w=w, u=s_["u"], s=s_["s"], p=s_["p"])
            if stateful:
                do_rep, new_wrep = w_replace(s_["k"] + 1, view, s_["wrep"])
            else:
                do_rep = w_replace(s_["k"] + 1, view)
            w = jax.lax.cond(do_rep, lambda _: ctx.mv(rt), lambda _: w, None)
        wt = ctx.prec(w) if ctx.has_prec else w
        # ONE sync phase: dots issued before the matvec so the reduction
        # overlaps t = A wt (row partition), or everything rides a single
        # packed collective (col partition, mpi4py gv_cg.py:29-38)
        extra = _norm_pair(ctx, r, rt)
        t, out = ctx.mv_dots(wt, ((r, rt), (w, rt)) + extra)
        nu, eta = out[0], out[1]
        beta = _safe_div(nu, s_["nu"])
        p = rt + beta * s_["p"]
        s = w + beta * s_["s"]
        u = t + beta * s_["u"]
        mu = eta - _safe_div(beta, a1) * nu
        new = dict(
            x=x, r=r, w=w, p=p, s=s, u=u, nu=nu, eta=eta, mu=mu, a=_safe_div(nu, mu), b=beta
        )
        if new_wrep is not None:
            new["wrep"] = new_wrep
        if extra:
            new["rho"] = out[-1]
        if ctx.has_prec:
            new["rt"] = rt
            new["wt"] = wt
            new["st"] = wt + beta * s_["st"]
        return _rotate(s_, new)

    return gv_step


gv_step = make_gv_step()


# ---------------------------------------------------------------------------
# Predict-and-recompute (PR) / Meurant (M) CG — cf. cg_variants/pr_cg.py
# ---------------------------------------------------------------------------


def _predict_nu(meurant: bool, s_):
    """Predicted nu_k from iteration-(k-1) scalars.

    PR:      nu = nu1 - 2*a1*delta1 + a1^2*gamma1
    Meurant: nu = -nu1 + a1^2*gamma1
    (cf. cg_variants/pr_cg.py:62-63)
    """
    a1 = s_["a"]
    if meurant:
        return -s_["nu"] + a1 * a1 * s_["gamma"]
    return s_["nu"] - 2.0 * a1 * s_["delta"] + a1 * a1 * s_["gamma"]


def pr_init(ctx, b, x0):
    x = x0
    r = b - ctx.mv(x)
    rt = ctx.prec(r)
    p = rt
    s = ctx.mv(p)
    st_ = ctx.prec(s)
    nu, mu, delta, gamma = ctx.dots((rt, r), (p, s), (r, st_), (st_, s))
    state = dict(
        x=x, r=r, p=p, s=s, delta=delta, gamma=gamma,
        **_common_scalars(nu, mu, b.dtype),
    )
    if ctx.has_prec:
        state.update(rt=rt, st=st_)
    return state


def make_pr_step(meurant: bool):
    def pr_step(ctx, s_):
        a1 = s_["a"]
        nu_pred = _predict_nu(meurant, s_)
        beta_pred = _safe_div(nu_pred, s_["nu"])
        if getattr(ctx, "extra_norm", None) is None:
            # beta is PREDICTED (known at entry), so the whole iteration
            # fuses into one Pallas pass: x,r(,rt) updates + p update +
            # s = A p (+ st = M^-1 s) + all 4 sync partials — the PETSc
            # KSPPRCG hot loop as one kernel (cg_impls/prcg.c:122-137).
            # Update order identical to the generic body below.
            if not ctx.has_prec:
                hook = getattr(ctx, "pr_full_step", None)
                fused = hook(s_, a1, beta_pred) if hook is not None else None
                if fused is not None:
                    x, r, p, s, (mu, delta, gamma, nu) = fused
                    new = dict(x=x, r=r, p=p, s=s, nu=nu, mu=mu,
                               delta=delta, gamma=gamma, a=_safe_div(nu, mu),
                               b=beta_pred)
                    return _rotate(s_, new)
            else:
                hook = getattr(ctx, "pr_full_step_prec", None)
                fused = hook(s_, a1, beta_pred) if hook is not None else None
                if fused is not None:
                    x, r, rt, p, s, st_, (mu, delta, gamma, nu) = fused
                    new = dict(x=x, r=r, p=p, s=s, nu=nu, mu=mu,
                               delta=delta, gamma=gamma, a=_safe_div(nu, mu),
                               b=beta_pred, rt=rt, st=st_)
                    return _rotate(s_, new)
        x = s_["x"] + a1 * s_["p"]
        r = s_["r"] - a1 * s_["s"]
        if ctx.has_prec:
            rt = s_["rt"] - a1 * s_["st"]
        else:
            rt = r
        beta = beta_pred
        p = rt + beta * s_["p"]
        s = ctx.mv(p)
        st_ = ctx.prec(s) if ctx.has_prec else s
        # one fused 4-dot sync; nu is RECOMPUTED here (used for alpha),
        # while beta above used the predicted value
        extra = _norm_pair(ctx, r, rt)
        out = ctx.dots((p, s), (r, st_), (st_, s), (rt, r), *extra)
        mu, delta, gamma, nu = out[:4]
        new = dict(
            x=x, r=r, p=p, s=s, nu=nu, mu=mu, delta=delta, gamma=gamma,
            a=_safe_div(nu, mu), b=beta,
        )
        if extra:
            new["rho"] = out[-1]
        if ctx.has_prec:
            new["rt"] = rt
            new["st"] = st_
        return _rotate(s_, new)

    return pr_step


# ---------------------------------------------------------------------------
# Pipelined predict(-and-recompute) (Meurant) CG — cf. cg_variants/pipe_pr_cg.py
# and the PETSc KSPPIPEPRCG hot loop (cg_impls/pipeprcg.c:109-178)
# ---------------------------------------------------------------------------


def pipe_init(ctx, b, x0):
    x = x0
    r = b - ctx.mv(x)
    rt = ctx.prec(r)
    p = rt
    s = ctx.mv(p)
    st_ = ctx.prec(s)
    w = s
    wt = st_
    u = ctx.mv(st_)
    ut = ctx.prec(u)
    nu, mu, delta, gamma = ctx.dots((rt, r), (p, s), (r, st_), (st_, s))
    state = dict(
        x=x, r=r, p=p, s=s, w=w, u=u, delta=delta, gamma=gamma,
        **_common_scalars(nu, mu, b.dtype),
    )
    if ctx.has_prec:
        state.update(rt=rt, st=st_, wt=wt, ut=ut)
    return state


def make_pipe_step(meurant: bool, recompute: bool):
    def pipe_step(ctx, s_):
        a1 = s_["a"]
        nu_pred = _predict_nu(meurant, s_)
        beta = _safe_div(nu_pred, s_["nu"])
        if not ctx.has_prec:
            # whole-iteration fusion first: vector phase + dot partials +
            # both SpMVs as ONE Pallas pass over HBM (ops/fused_step.py
            # full-step kernel) when the context/operator qualifies
            full = getattr(ctx, "pipe_full_step", None)
            fused = full(s_, a1, beta, recompute) if full is not None else None
            if fused is not None:
                x, r, w, p, s, u, (mu, delta, gamma, nu) = fused
                new = dict(
                    x=x, r=r, p=p, s=s, w=w, u=u, nu=nu, mu=mu, delta=delta,
                    gamma=gamma, a=_safe_div(nu, mu), b=beta,
                )
                return _rotate(s_, new)
            # fused vector phase: 5 updates + the single 4-dot sync in
            # one kernel pass on TPU (ops/fused_step.py), generic
            # formulation elsewhere — identical update order either way
            x, r, w, p, s, (mu, delta, gamma, nu) = ctx.pipe_vector_phase(
                s_["x"], s_["r"], s_["w"], s_["u"], s_["p"], s_["s"],
                a1, beta,
            )
            if recompute:
                u, w = ctx.mv2(s, r)  # fused 2-RHS matvec
            else:
                u = ctx.mv(s)
            new = dict(
                x=x, r=r, p=p, s=s, w=w, u=u, nu=nu, mu=mu, delta=delta,
                gamma=gamma, a=_safe_div(nu, mu), b=beta,
            )
            return _rotate(s_, new)
        # Preconditioned path.  Whole-iteration fusion first (vector
        # phase + dot partials + both SpMVs + both PCApplies in ONE
        # Pallas pass — the TPU realization of the PETSc overlapped
        # MatMult+PCApply hot region, cg_impls/pipeprcg.c:162-170), then
        # the fused vector phase, then the generic formulation; identical
        # update order in all three.
        full = getattr(ctx, "pipe_full_step_prec", None)
        fused = full(s_, a1, beta, recompute) if full is not None else None
        if fused is not None:
            x, r, w, p, s, u, rt, st_, wt, ut, (mu, delta, gamma, nu) = fused
            new = dict(
                x=x, r=r, p=p, s=s, w=w, u=u, nu=nu, mu=mu, delta=delta,
                gamma=gamma, a=_safe_div(nu, mu), b=beta, rt=rt, st=st_, wt=wt, ut=ut,
            )
            return _rotate(s_, new)
        vp = getattr(ctx, "pipe_vector_phase_prec", None)
        vec = vp(s_, a1, beta) if vp is not None else None
        if vec is not None:
            x, r, w, rt, wt, p, s, st_, (mu, delta, gamma, nu) = vec
            if recompute:
                u, w = ctx.mv2(st_, rt)  # fused 2-RHS matvec
                wt = ctx.prec(w)
            else:
                u = ctx.mv(st_)
            ut = ctx.prec(u)
            new = dict(
                x=x, r=r, p=p, s=s, w=w, u=u, nu=nu, mu=mu, delta=delta,
                gamma=gamma, a=_safe_div(nu, mu), b=beta, rt=rt, st=st_, wt=wt, ut=ut,
            )
            return _rotate(s_, new)
        x = s_["x"] + a1 * s_["p"]
        r = s_["r"] - a1 * s_["s"]
        w = s_["w"] - a1 * s_["u"]
        rt = s_["rt"] - a1 * s_["st"]
        wt = s_["wt"] - a1 * s_["ut"]
        p = rt + beta * s_["p"]
        s = w + beta * s_["s"]
        st_ = wt + beta * s_["st"]
        # The single communication phase: local dot partials are formed
        # first so the fused reduction can overlap BOTH matvecs below
        # (VecDotBegin/MDotBegin ... MatMult ... VecDotEnd in pipeprcg.c);
        # packed contexts carry matvec partials + scalars in one psum.
        extra = _norm_pair(ctx, r, rt)
        pairs = ((p, s), (r, st_), (st_, s), (rt, r)) + extra
        if recompute:
            # fused 2-RHS matvec: u = A st, w = A rt
            u, w, out = ctx.mv2_dots(st_, rt, pairs)
        else:
            u, out = ctx.mv_dots(st_, pairs)
        mu, delta, gamma, nu = out[:4]
        if ctx.has_prec:
            ut = ctx.prec(u)
            if recompute:
                wt = ctx.prec(w)
        new = dict(
            x=x, r=r, p=p, s=s, w=w, u=u, nu=nu, mu=mu, delta=delta,
            gamma=gamma, a=_safe_div(nu, mu), b=beta,
        )
        if extra:
            new["rho"] = out[-1]
        if ctx.has_prec:
            new.update(rt=rt, st=st_, wt=wt, ut=ut)
        return _rotate(s_, new)

    return pipe_step


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

FAMILIES = {
    "hs": (hs_init, hs_step),
    "cgcg": (cgcg_init, cgcg_step),
    "gv": (gv_init, gv_step),
    "pr": (pr_init, make_pr_step(meurant=False)),
    "m": (pr_init, make_pr_step(meurant=True)),
    "pipe_p": (pipe_init, make_pipe_step(meurant=False, recompute=False)),
    "pipe_pr": (pipe_init, make_pipe_step(meurant=False, recompute=True)),
    "pipe_p_m": (pipe_init, make_pipe_step(meurant=True, recompute=False)),
    "pipe_pr_m": (pipe_init, make_pipe_step(meurant=True, recompute=True)),
}


def family_of(variant: str) -> tuple:
    """Map a public variant name (e.g. ``'pipe_pr_pcg'``) to its family.

    Returns ``(family_key, preconditioned)``.
    """
    name = variant
    prec = name.endswith("pcg")
    base = name[: -len("_pcg")] if prec else name[: -len("_cg")]
    key = {"hs": "hs", "cg": "cgcg", "gv": "gv", "pr": "pr", "m": "m"}.get(base, base)
    if key not in FAMILIES:
        raise KeyError(f"unknown variant {variant!r}")
    return key, prec
