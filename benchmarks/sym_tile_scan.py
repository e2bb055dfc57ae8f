"""Tile scan for the fused half-band kernels (round 5).

pick_tile's 8192 preference was measured on the PARALLEL-grid full-DIA
full step (tile_scan.json); the sym kernels run a SEQUENTIAL grid with
spill carry and are VPU-bound (pipe) / HBM-bound (hs) — re-scan both.
Appends to benchmarks/tile_scan.json under "symdia".  One device process.
Usage: python benchmarks/sym_tile_scan.py <tile> <variant>
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

tile = sys.argv[1]
variant = sys.argv[2]
os.environ["NCGV_FUSED_TILE"] = tile

from benchmarks.run_all import time_fixed_iters  # noqa: E402

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    import new_cg_variants_tpu as cgt

    op, b, _ = cgt.banded_model(655_360, k=32, fmt="symdia")
    op = op.astype(jnp.float32)
    t_iter, _ = time_fixed_iters(variant, op, np.asarray(b), 5000)
    p = pathlib.Path(__file__).parent / "tile_scan.json"
    doc = json.loads(p.read_text())
    doc.setdefault("symdia", {})[f"{variant}_tile{tile}"] = t_iter * 1e3
    p.write_text(json.dumps(doc, indent=1))
    print(f"{variant} tile {tile}: {t_iter*1e3:.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
