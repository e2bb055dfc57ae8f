"""Distributed f32x2 accuracy artifact: the reference's mpi4py spectrum
experiment, re-run in the double-word mode over an 8-device mesh.

Every distributed experiment in the reference runs in float64
(``scaling_experiments_mpi4py/scaling_tests.py:51-57``, forward errors
~1.1e-7 at ``:81``); rounds 1-4 of this framework could only run the
mesh in f32 (+compensated psums), which the accuracy studies proved
insufficient.  Round 5's :class:`~new_cg_variants_tpu.parallel.contexts.
DFRowShardContext` carries double-word vectors, the exact three-word
operator and a double-word-preserving all_gather reduction through
``shard_map``; this script demonstrates reference-class forward error
on the reference's own configuration (n = 12288, kappa = 1e6, rho = 0.9,
1500 fixed iterations) next to the plain-f32 mesh numbers.

Runs on the virtual 8-device CPU mesh (multi-chip hardware is not
available to the builder); the program is backend-agnostic shard_map.
Writes benchmarks/dist_f32x2.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

N = 12_288
MAX_ITER = 1500
KAPPA = 1e6
RHO = 0.9

#: reference f64 forward errors, min/mean over shipped trials
#: (scaling_experiments_mpi4py data via scaling_plots.py; SURVEY §6)
REFERENCE_F64 = {"hs_cg": 1.1e-07, "cg_cg": 2.5e-06, "gv_cg": 5e-05,
                 "pr_cg": 2.4e-07, "pipe_pr_cg": 4e-07}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import new_cg_variants_tpu as cgt
    from new_cg_variants_tpu.parallel import dist_solve
    from new_cg_variants_tpu.parallel.dist import make_mesh
    from new_cg_variants_tpu.utils.env_info import env_info

    mesh = make_mesh(8)
    op, b, x_true = cgt.model_spectrum(N, kappa=KAPPA, rho=RHO)

    results = {"env": env_info(), "n": N, "max_iter": MAX_ITER,
               "mesh_devices": 8, "configs": {}}
    out = pathlib.Path(__file__).parent / "dist_f32x2.json"
    for variant in ["hs_cg", "cg_cg", "gv_cg", "pr_cg", "pipe_pr_cg"]:
        row = {"reference_f64_error": REFERENCE_F64.get(variant)}
        res = dist_solve(op, b, variant=variant, mesh=mesh, rtol=0,
                         max_iter=MAX_ITER, norm_type="none", dtype="f32x2")
        row["f32x2_error"] = float(np.linalg.norm(res.x - x_true))
        res32 = dist_solve(op.astype(np.float32), np.asarray(b, np.float32),
                           variant=variant, mesh=mesh, rtol=0,
                           max_iter=MAX_ITER, norm_type="none")
        row["f32_error"] = float(
            np.linalg.norm(np.asarray(res32.x, np.float64) - x_true)
        )
        results["configs"][variant] = row
        print(f"{variant:>12s}: f32x2 {row['f32x2_error']:.3e}  "
              f"f32 {row['f32_error']:.3e}  "
              f"ref f64 {row['reference_f64_error']:.1e}", flush=True)
        out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
