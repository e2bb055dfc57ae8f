"""Runtime environment capture.

The reference records its software/hardware configuration alongside the
results (``scaling_experiments_petsc/config_info/``: PETSc configure log,
Slurm environment dumps) and writes exact reproduction commands as
``.call`` files (``strong_scaling_tests.py:98-103``).  :func:`env_info`
is the TPU equivalent — JAX/device/flags snapshot — and
:func:`write_call_file` records the exact CLI invocation next to each
result set.
"""

from __future__ import annotations

import json
import os
import pathlib
import platform
import sys

__all__ = ["env_info", "write_env_info", "write_call_file"]


def env_info() -> dict:
    import jax

    devs = jax.devices()
    return {
        "python": sys.version,
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "device_count": len(devs),
        "process_count": jax.process_count(),
        "x64": bool(jax.config.jax_enable_x64),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "libtpu_init_args": os.environ.get("LIBTPU_INIT_ARGS", ""),
    }


def write_env_info(data_dir) -> pathlib.Path:
    d = pathlib.Path(data_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / "env_info.json"
    path.write_text(json.dumps(env_info(), indent=1))
    return path


def write_call_file(data_dir, name: str, argv=None) -> pathlib.Path:
    """Record the exact invocation (the reference's ``.call`` files)."""
    d = pathlib.Path(data_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{name}.call"
    path.write_text(" ".join(argv if argv is not None else sys.argv) + "\n")
    return path
