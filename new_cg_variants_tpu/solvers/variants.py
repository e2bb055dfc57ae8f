"""The 20 public variant entry points.

Name-for-name parity with the reference's exports
(``numerical_experiments/cg_variants/__init__.py:64-74``): ``hs_cg``,
``hs_pcg``, ``cg_cg``, ``cg_pcg``, ``gv_cg``, ``gv_pcg``, ``pr_cg``,
``pr_pcg``, ``m_cg``, ``m_pcg``, ``pipe_p_cg``, ``pipe_pr_cg``,
``pipe_p_m_cg``, ``pipe_pr_m_cg`` and their ``_pcg`` twins, plus the
extended-precision oracle ``exact_cg`` / ``exact_pcg``
(:mod:`.oracle`).

Each wrapper shares the reference signature shape
``variant(A, b, x0, max_iter, callbacks=..., preconditioner=..., **kw)``
but takes declarative ``probes`` instead of ``callback(**locals())``
(see :mod:`new_cg_variants_tpu.probes.probes` for the mapping).
"""

from __future__ import annotations

import sys

from .api import VARIANT_NAMES, run
from .oracle import exact_cg, exact_pcg

__all__ = list(VARIANT_NAMES) + ["exact_cg", "exact_pcg"]


def _make_variant(name):
    def variant(
        A,
        b,
        x0=None,
        max_iter=100,
        probes=("updated_residual_2_norm",),
        preconditioner=None,
        x_true=None,
        w_replace=None,
        dtype=None,
        **kwargs,
    ):
        return run(
            name,
            A,
            b,
            x0=x0,
            max_iter=max_iter,
            probes=probes,
            preconditioner=preconditioner,
            x_true=x_true,
            w_replace=w_replace,
            dtype=dtype,
        )

    variant.__name__ = name
    variant.__qualname__ = name
    variant.__doc__ = f"TPU-native {name} (see solvers.families for the math)."
    return variant


_mod = sys.modules[__name__]
for _name in VARIANT_NAMES:
    setattr(_mod, _name, _make_variant(_name))
