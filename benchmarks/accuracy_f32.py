"""TPU f32 attainable-accuracy study: plain vs compensated dots.

The reference's convergence results are float64; TPUs compute in f32.
This experiment measures what that costs and what the error-free-
transform dots (``compensated=True``) buy back, on a fixture matrix:
error-A-norm histories for f64 (CPU reference), f32 plain, and f32
compensated, plus the derived table metrics.  Writes
``benchmarks/accuracy_f32.json`` and a comparison figure.

Run on the TPU host: ``python benchmarks/accuracy_f32.py``
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt

    matrix, prec, max_iter = "bcsstk03", "jacobi", 250
    coo = cgt.load_matrix(matrix)
    a = coo.toarray()
    n = a.shape[0]
    x_true = np.ones(n) / np.sqrt(n)
    b = a @ x_true

    runs = {}
    for label, kwargs in [
        ("f32_plain", dict(dtype=jnp.float32)),
        ("f32_compensated", dict(dtype=jnp.float32, compensated=True)),
    ]:
        out = cgt.run(
            "pipe_pr_pcg", a, b, max_iter=max_iter, preconditioner=prec,
            probes=("error_A_norm",), x_true=x_true, **kwargs,
        )
        runs[label] = np.asarray(out["error_A_norm"], np.float64)
        print(label, "best rel:",
              float(np.nanmin(runs[label] / runs[label][0])), flush=True)

    results = {"matrix": matrix, "preconditioner": prec, "max_iter": max_iter}
    for label, hist in runs.items():
        rel = hist / hist[0]
        results[label] = {
            "iters_to_1e-5": int(np.argmin(rel > 1e-5)),
            "log10_best": float(np.log10(np.nanmin(rel))),
        }

    out_dir = pathlib.Path(__file__).resolve().parent
    (out_dir / "accuracy_f32.json").write_text(json.dumps(results, indent=1))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f, ax = plt.subplots(figsize=(6, 4))
    for label, hist in runs.items():
        ax.plot(hist / hist[0], label=label)
    ax.set_yscale("log")
    ax.set_xlabel("iteration $k$")
    ax.set_ylabel("relative A-norm error")
    ax.grid(True, linestyle=":")
    ax.legend()
    f.savefig(out_dir / "accuracy_f32.pdf", bbox_inches="tight")
    print("wrote", out_dir / "accuracy_f32.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
