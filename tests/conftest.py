"""Test configuration: force CPU x64 with an 8-device virtual mesh.

Convergence-parity tests need float64 (the reference histories are
float64 NumPy; attainable accuracy is dtype-defined — SURVEY §7 "hard
parts"), and distributed tests need multiple devices without TPU
hardware, so tests run on the CPU backend with
``--xla_force_host_platform_device_count=8`` — the JAX analog of the
reference's oversubscribed single-machine ``mpiexec -n 8`` testing
(``scaling_experiments_mpi4py/scaling_tests.py:14``).

Env/config order matters: XLA_FLAGS must be set before the CPU client is
created, and the platform override must beat the axon sitecustomize's
``jax_platforms=axon,cpu`` pin.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def make_spd(n, cond=1e3, seed=0):
    """Small dense SPD test matrix with geometric spectrum."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.geomspace(1.0 / cond, 1.0, n)
    a = (q * lam) @ q.T
    return (a + a.T) / 2.0


@pytest.fixture(scope="session")
def spd64():
    return make_spd(64)
