"""Regenerate the strong-scaling figure artifact (VERDICT r3 task 8).

The reference ships ``figures/strong_scale.*`` from both of its
harnesses (``scaling_experiments_mpi4py/scaling_plots.py:91-92``,
``scaling_experiments_petsc/strong_scaling_plots.py:126-127``).  This
driver produces the repo's analog under ``artifacts/scaling/``:

* a {1,2,4,8}-device CPU-mesh run of the five mpi4py variants on the
  mpi4py diagonal model problem (n = 12288, 1500 iterations, f64) —
  STRUCTURAL scaling: it validates the distributed execution paths and
  plots forward error next to runtime (the reference's own honesty
  device, ``scaling_plots.py:66,86``); CPU-mesh wall times are NOT TPU
  performance numbers;
* the real single-chip measurements merged in as ``*_tpu1chip`` rows
  when ``benchmarks/spectrum.json`` exists (same problem, real device).

Runs entirely on the CPU backend — safe to execute WITHOUT the chip
(and must not run concurrently with a chip process).  Writes per-trial
JSONs + ``artifacts/scaling/strong_scale.{pdf,svg}``.
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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

VARIANTS = ["hs_cg", "cg_cg", "gv_cg", "pr_cg", "pipe_pr_cg"]
N, MAX_ITER = 12288, 1500
ART = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "scaling"


def main():
    import numpy as np

    from new_cg_variants_tpu.harness.scaling import scaling_run
    from new_cg_variants_tpu.harness.scaling_plots import plot_strong_scaling

    data_dir = ART / "data"
    scaling_run(
        VARIANTS, problem="spectrum", n=N, max_iter=MAX_ITER, trials=3,
        mesh_sizes=(1, 2, 4, 8), dtype=np.float64, data_dir=data_dir,
    )

    # merge the real-chip rows (same problem/iteration count, one v5e)
    spec = pathlib.Path(__file__).parent / "spectrum.json"
    if spec.exists():
        rows = json.loads(spec.read_text())
        for variant, d in rows.items():
            if "total_s_1500_iters" not in d:
                continue
            (data_dir / f"{variant}_tpu1chip_p1_n{N}.json").write_text(
                json.dumps({
                    "variant": f"{variant}_tpu1chip", "n": N,
                    "max_iter": MAX_ITER, "n_devices": 1,
                    "times": [d["total_s_1500_iters"]],
                    "best": d["total_s_1500_iters"],
                    "time_per_iter": d["total_s_1500_iters"] / MAX_ITER,
                    "error": d["forward_error"],
                }, indent=1)
            )
            print(f"merged chip row {variant}: {d['total_s_1500_iters']:.3f}s")

    fig = plot_strong_scaling(data_dir, fig_dir=ART, title="strong_scale")
    print("wrote", fig)
    return 0


if __name__ == "__main__":
    sys.exit(main())
