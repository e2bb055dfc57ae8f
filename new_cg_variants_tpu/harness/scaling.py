"""Scaling-experiment harness: timed repeat solves with forward-error check.

The TPU-native analog of the reference's two scaling harnesses:

* mpi4py: ``mpiexec -n P scaling_tests.py n max_iter trial`` builds the
  diagonal model problem, times 1500 fixed iterations per variant, and
  checks forward error against the known solution ``x* = 1/sqrt(n)``
  (``scaling_experiments_mpi4py/scaling_tests.py``).
* PETSc: ``mpirun ./ex2b -ksp_type ... -num_repeat 10`` on the k-banded
  model problem, min-over-trials timing parsed from ``-log_view``
  (``scaling_experiments_petsc/strong_scaling_tests.py``).

Here a "rank count" is a mesh size (device count); a trial is a timed
fixed-iteration run under ``jit`` (single device) or ``shard_map``
(mesh); results are min-over-trials per configuration, exactly the
reduction the reference's plot scripts apply
(``scaling_plots.py:53``, ``strong_scaling_plots.py:88``).

Timing methodology: chained chunk execution with a device-to-host fetch
at the end (remote-device tunnels do not synchronize on
``block_until_ready`` alone), warmup excluded; per-phase breakdowns come
from :mod:`jax.profiler` traces, not host timers.
"""

from __future__ import annotations

import json
import pathlib
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = ["ScalingResult", "time_variant", "scaling_run", "save_result"]


@dataclass
class ScalingResult:
    variant: str
    n: int
    max_iter: int
    n_devices: int
    times: list = field(default_factory=list)  # seconds per trial
    error: float = float("nan")  # forward error ||x - x_true||

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    @property
    def time_per_iter(self) -> float:
        return self.best / self.max_iter

    def to_dict(self):
        return {
            "variant": self.variant, "n": self.n, "max_iter": self.max_iter,
            "n_devices": self.n_devices, "times": list(self.times),
            "best": self.best, "time_per_iter": self.time_per_iter,
            "error": self.error,
        }


def _fetch_scalar(x) -> float:
    return float(np.asarray(x))


def time_variant(
    variant,
    op,
    b,
    x_true=None,
    max_iter=1500,
    trials=3,
    mesh=None,
    partition="auto",
    preconditioner=None,
    dtype=None,
    chunk_iters=None,
):
    """Time ``trials`` fixed-iteration runs of a variant; min-over-trials.

    Returns a :class:`ScalingResult`.  The iteration loop is compiled
    once (``lax.fori_loop`` chunks) and re-executed per trial with
    chained state so nothing below the timer can cache.
    """
    import jax
    import jax.numpy as jnp

    from ..solvers.api import _resolve
    from ..solvers.context import Context

    if dtype is not None:
        op = op.astype(dtype)
    b = jnp.asarray(b, dtype=op.dtype)
    x0 = jnp.zeros_like(b)
    chunk_iters = chunk_iters or max_iter

    if mesh is None:
        init_fn, step_fn, precond = _resolve(variant, op, preconditioner)

        @jax.jit
        def init(op, precond, b, x0):
            return init_fn(Context(op, precond), b, x0)

        @jax.jit
        def chunk(op, precond, state):
            ctx = Context(op, precond)
            return jax.lax.fori_loop(
                0, chunk_iters, lambda _, s: step_fn(ctx, s), state
            )

        def one_trial(warm):
            s = init(op, precond, b, x0)
            t0 = time.perf_counter()
            for _ in range(max_iter // chunk_iters):
                s = chunk(op, precond, s)
            _fetch_scalar(s["nu"])
            return time.perf_counter() - t0, s

        n_devices = 1
    else:
        from ..parallel.dist import _dist_chunked

        one_trial = _dist_chunked(
            variant, op, b, mesh, partition, preconditioner,
            max_iter, chunk_iters,
        )
        n_devices = int(mesh.devices.size)

    # warmup (compile) + timed trials
    one_trial(warm=True)
    times = []
    state = None
    for _ in range(trials):
        dt, state = one_trial(warm=False)
        times.append(dt)

    err = float("nan")
    if x_true is not None and state is not None:
        x = np.asarray(state["x"], dtype=np.float64)
        err = float(np.linalg.norm(x - np.asarray(x_true, dtype=np.float64)))

    return ScalingResult(
        variant=variant, n=int(op.n), max_iter=max_iter,
        n_devices=n_devices, times=times, error=err,
    )


def scaling_run(
    variants,
    problem="banded",
    n=65536,
    max_iter=1500,
    trials=3,
    mesh_sizes=(1,),
    preconditioner=None,
    dtype=None,
    data_dir=None,
    verbose=True,
    **problem_kwargs,
):
    """Run the full scaling matrix: variants x mesh sizes.

    ``problem``: ``'banded'`` (PETSc ex2a/ex2b model) or ``'spectrum'``
    (mpi4py diagonal model).  Results saved one JSON per (variant, mesh)
    when ``data_dir`` given — the analog of the reference's per-trial
    ``.npy`` files (``scaling_tests.py:85-86``).
    """
    from ..matio.problems import banded_model, model_spectrum
    from ..parallel.dist import make_mesh

    if problem == "banded":
        op, b, x_true = banded_model(n, **problem_kwargs)
    elif problem == "spectrum":
        op, b, x_true = model_spectrum(n, **problem_kwargs)
    else:
        raise ValueError(f"unknown problem {problem!r}")

    if data_dir is not None:
        from ..utils.env_info import write_env_info

        write_env_info(data_dir)

    results = []
    for p in mesh_sizes:
        mesh = None if p == 1 else make_mesh(p)
        for variant in variants:
            res = time_variant(
                variant, op, b, x_true=x_true, max_iter=max_iter,
                trials=trials, mesh=mesh, preconditioner=preconditioner,
                dtype=dtype,
            )
            results.append(res)
            if verbose:
                print(
                    f"{variant:>14s} p={p}: best {res.best:.4f}s "
                    f"({res.time_per_iter*1e3:.3f} ms/iter), err {res.error:.3e}"
                )
            if data_dir is not None:
                save_result(res, data_dir)
    return results


def save_result(res: ScalingResult, data_dir):
    d = pathlib.Path(data_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{res.variant}_p{res.n_devices}_n{res.n}.json"
    path.write_text(json.dumps(res.to_dict(), indent=1))
    return path
