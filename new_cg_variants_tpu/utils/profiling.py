"""Profiling and derived performance metrics.

The reference's tracing layer is (a) barrier-synchronized ``MPI.Wtime``
buckets around the solver loop (``scaling_experiments_mpi4py/cg_variants/
hs_cg.py:31-34,62-64``) and (b) PETSc ``-log_view`` XML event timing
parsed by ``strong_scaling_plots.py:43-59``.  On TPU the authoritative
per-op timeline comes from the XLA profiler, so this module provides:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (the ``-log_view`` analog); pass the
  directory to inspect kernel overlap (e.g. whether the packed-psum
  all-reduce-start/done brackets the SpMV — the split-reduction check
  SURVEY §7 calls for).
* :func:`derived_metrics` — nnz/s, GFLOP/s, effective HBM GB/s and
  time/iteration from a timed run, the numbers BASELINE.json tracks.
* :class:`Timer` — tunnel-safe wall timing (device-to-host fetch based,
  since ``block_until_ready`` alone does not synchronize through remote
  device tunnels).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = ["trace", "derived_metrics", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace over the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def derived_metrics(
    op, seconds: float, iterations: int, matvecs_per_iter: int = 1,
    dtype_bytes: int = 4,
) -> dict:
    """BASELINE-style throughput numbers for a timed fixed-iteration run.

    ``matvecs_per_iter``: 1 for hs/cg/gv/pr families, 2 for the
    recomputing pipelined variants (pipe_pr*, which apply A to both st
    and rt each iteration — ``cg_impls/pipeprcg.c:162-170``).
    """
    nnz = int(op.nnz)
    t_iter = seconds / max(iterations, 1)
    flops = 2.0 * nnz * matvecs_per_iter  # multiply+add per stored entry
    data_bytes = nnz * dtype_bytes * matvecs_per_iter
    return {
        "time_per_iter_s": t_iter,
        "nnz_per_s": nnz * matvecs_per_iter / t_iter,
        "gflops": flops / t_iter / 1e9,
        "spmv_gbytes_per_s": data_bytes / t_iter / 1e9,
    }


@dataclass
class Timer:
    """Tunnel-safe accumulating wall timer.

    >>> t = Timer()
    >>> with t.measure():
    ...     out = step(...)          # async dispatch
    ...     t.sync(out["nu"])        # fetch forces real completion
    """

    times: list = field(default_factory=list)
    _t0: float = 0.0

    @contextlib.contextmanager
    def measure(self):
        self._t0 = time.perf_counter()
        yield self
        self.times.append(time.perf_counter() - self._t0)

    @staticmethod
    def sync(x) -> float:
        return float(np.asarray(x))

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")
