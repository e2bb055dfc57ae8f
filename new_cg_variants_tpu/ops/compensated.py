"""Error-free-transform (compensated) inner products for f32 TPUs.

TPU MXU/VPU arithmetic is f32-native and JAX x64 is unavailable on TPU,
but the CG scalar recurrences (nu, mu, delta, gamma) are exactly the
reduction-sensitive quantities that set attainable accuracy (SURVEY §7
"hard parts"; the reference computes everything in float64 NumPy).
This module implements Dekker/Knuth error-free transforms in plain JAX
ops — compiler-safe, no FMA assumption — giving dot products with
roughly twice the working precision (Ogita-Rump-Oishi "Dot2" with tree
accumulation: forward error O(eps^2 * n) instead of O(eps * n)).

Used by the execution contexts when ``compensated=True``: single-device
``dots`` and the mesh contexts' packed-``psum`` reduction both carry a
(value, error) pair; cross-device combination sums the two components
separately before the final renormalizing ``two_sum``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "fast_two_sum", "df_add", "comp_dot", "comp_dot_pair"]


def two_sum(a, b):
    """Knuth 2Sum: a + b = s + e exactly (no magnitude assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Dekker split against the working dtype's half-precision constant."""
    # f32: 2^12 + 1; f64: 2^27 + 1 (Dekker's splitter for 24/53-bit
    # mantissas) — dtype is static, so this branch resolves at trace time
    splitter = 134217729.0 if jnp.asarray(a).dtype == jnp.float64 else 4097.0
    c = jnp.asarray(splitter, dtype=jnp.asarray(a).dtype)
    t = c * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker 2Prod: a * b = p + e exactly (barring over/underflow)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def fast_two_sum(a, b):
    """Dekker fast 2Sum; requires |a| >= |b| (holds after df_add's 2Sum)."""
    s = a + b
    e = b - (s - a)
    return s, e


def df_add(ah, al, bh, bl):
    """Accurate double-float addition (two 2Sums + two renormalizations).

    The textbook "sloppy" variant (one 2Sum, low words folded in with a
    plain add) has an O(eps) RELATIVE error when the high words cancel —
    and cancellation is the core operation of a CG residual update
    (``r = r - alpha*s``): with the sloppy add the f32x2 solve floor
    measured ~30 bits instead of ~48.  This is the Knuth/Shewchuk
    accurate sum: relative error O(eps^2) for any sign pattern, at the
    cost of one extra 2Sum (6 more flops) — elementwise, fully
    XLA-fusable.
    """
    sh, se = two_sum(ah, bh)
    th, te = two_sum(al, bl)
    se = se + th
    sh, se = fast_two_sum(sh, se)
    se = se + te
    return fast_two_sum(sh, se)


def _df_tree_sum(hi, lo):
    """Tree reduction in double-float arithmetic.

    log2(n) vectorized halving steps — keeps the VPU busy where the
    textbook sequential Dot2 recursion would serialize; every partial
    carries its own error term, so the summation error (which dominates
    the product error for long vectors) is compensated too.
    """
    n = hi.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = m - n
        hi = jnp.concatenate([hi, jnp.zeros((pad,), hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros((pad,), lo.dtype)])
    while m > 1:
        half = m // 2
        hi, lo = df_add(hi[:half], lo[:half], hi[half:], lo[half:])
        m = half
    return hi[0], lo[0]


def comp_dot_pair(x, y):
    """Compensated dot product; returns the unevaluated (value, error) pair.

    Products are error-free-transformed elementwise (2Prod), then
    accumulated with the double-float tree sum — the vectorized
    equivalent of Ogita-Rump-Oishi Dot2, with forward error O(eps^2)
    relative to the exact dot of the rounded inputs.
    """
    x = jnp.ravel(x)
    y = jnp.ravel(y)
    p, e = two_prod(x, y)
    return _df_tree_sum(p, e)


def comp_dot(x, y):
    """Compensated dot product collapsed to a working-precision scalar."""
    s, c = comp_dot_pair(x, y)
    return s + c
