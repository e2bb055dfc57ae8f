"""Preconditioners.

The reference uses exactly one preconditioner in its experiments — Jacobi,
``x -> x / diag(A)`` (``numerical_experiments/figure_gen.py:42-44``) — but
threads arbitrary callables through every ``*_pcg`` variant.  Here a
preconditioner is a pytree object with ``apply(v)`` so it can cross
``jit``/``shard_map`` boundaries; ``FunctionPreconditioner`` wraps a raw
callable for API parity with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["JacobiPreconditioner", "FunctionPreconditioner", "IdentityPreconditioner", "make_preconditioner"]


@jax.tree_util.register_pytree_node_class
@dataclass
class JacobiPreconditioner:
    """Diagonal scaling  M^{-1} v = v / diag(A)."""

    inv_diag: jnp.ndarray

    @classmethod
    def from_operator(cls, op):
        d = op.diagonal()
        if d.dtype == jnp.bfloat16:
            # bf16 is a storage tier for the MATRIX data; the inverse
            # diagonal is one vector — keep the PCApply in f32
            d = d.astype(jnp.float32)
        return cls(1.0 / d)

    def apply(self, v):
        return self.inv_diag * v

    def astype(self, dtype):
        return JacobiPreconditioner(self.inv_diag.astype(dtype))

    def tree_flatten(self):
        return (self.inv_diag,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class IdentityPreconditioner:
    """M = I.  Used when a ``*_pcg`` variant is run without a spec, matching
    the reference default ``preconditioner=lambda x: x``."""

    def apply(self, v):
        return v

    def astype(self, dtype):
        return self

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()


@jax.tree_util.register_pytree_node_class
class FunctionPreconditioner:
    """Wrap a traceable callable ``v -> M^{-1} v``.

    The callable is pytree aux data: jit caches key on its identity, so
    reuse the same function object across runs to avoid recompilation.
    """

    def __init__(self, fn):
        self.fn = fn

    def apply(self, v):
        return self.fn(v)

    def astype(self, dtype):
        return self

    def tree_flatten(self):
        return (), self.fn

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux)


def make_preconditioner(spec, op):
    """Resolve a preconditioner spec.

    ``spec`` may be None, ``'jacobi'``, a preconditioner object, or a
    callable.
    """
    if spec is None:
        return None
    if isinstance(spec, str):
        if spec == "jacobi":
            return JacobiPreconditioner.from_operator(op)
        raise ValueError(f"unknown preconditioner {spec!r}")
    if hasattr(spec, "apply"):
        return spec
    if callable(spec):
        return FunctionPreconditioner(spec)
    raise TypeError(f"bad preconditioner spec: {spec!r}")
