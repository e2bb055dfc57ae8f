"""new_cg_variants_tpu — TPU-native predict-and-recompute CG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference reproduction package for Chen & Carson, "Predict-and-recompute
conjugate gradient variants" (arXiv:1905.01549; tchen-research/
new_cg_variants): the full CG variant family, the convergence-measurement
machinery, and the single-reduction-per-iteration distributed execution
structure — re-expressed for TPU meshes (``shard_map`` + fused ``psum`` +
Pallas SpMV kernels) instead of MPI.

Layout (SURVEY.md §7):

* :mod:`.matio`    — MatrixMarket I/O and synthetic model problems (L0)
* :mod:`.ops`      — operators and TPU kernels: DIA/ELL/dense SpMV,
  fused dot batches (L1)
* :mod:`.solvers`  — the variant families, probe-instrumented history
  runs, tolerance solves, extended-precision oracle (L2)
* :mod:`.probes`   — declarative observability (L3)
* :mod:`.parallel` — mesh partitioning, halo exchange, fused-psum
  distributed solves (L4)
* :mod:`.harness`  — convergence/scaling experiment drivers + reporting
  (L4-L6)
"""

from .matio.matrix_market import CooMatrix, load_matrix, read_mtx, write_mtx
from .matio.problems import banded_model, model_spectrum
from .ops.operators import (
    DenseOperator, DiaOperator, EllOperator, as_operator, from_coo,
)
from .ops.stencil import BandedStencilOperator
from .solvers.api import SolveResult, VARIANT_NAMES, run, solve
from .solvers.precond import JacobiPreconditioner, make_preconditioner
from .solvers.variants import *  # noqa: F401,F403 — the 20 public variants
from .solvers.variants import __all__ as _variant_all

__version__ = "0.1.0"

__all__ = [
    "CooMatrix", "load_matrix", "read_mtx", "write_mtx",
    "banded_model", "model_spectrum",
    "DenseOperator", "DiaOperator", "EllOperator", "BandedStencilOperator",
    "as_operator", "from_coo",
    "SolveResult", "VARIANT_NAMES", "run", "solve",
    "JacobiPreconditioner", "make_preconditioner",
    "__version__",
] + list(_variant_all)
