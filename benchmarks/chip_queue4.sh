#!/bin/bash
# Round-4 serial chip queue — ONE device process at a time, nothing
# CPU-heavy concurrent (PERF.md methodology note 4).  Every arm is
# bounded by timeout and resumable: interrupted re-runs continue where
# they stopped (suite_driver skips measured variants; the archive move
# below is guarded so a re-run never clobbers it — ADVICE r3 #1).
cd /root/repo
echo "=== bench.py (headline @ HEAD) ==="
timeout 1800 python bench.py
echo "=== breadth suite (fresh re-measure: device-resident operator, 14 variants) ==="
[ -e benchmarks/results_r3.json ] || mv benchmarks/results.json benchmarks/results_r3.json 2>/dev/null
timeout 14400 python benchmarks/suite_driver.py
echo "=== spectrum (mpi4py configuration) ==="
[ -e benchmarks/spectrum_r3.json ] || mv benchmarks/spectrum.json benchmarks/spectrum_r3.json 2>/dev/null
timeout 1800 python benchmarks/spectrum_bench.py
echo "=== chip trace (per-phase breakdown, fused + generic) ==="
timeout 3600 python benchmarks/chip_trace.py
echo "=== accuracy study (6 matrices, f32 / compensated / f32x2) ==="
[ -e benchmarks/accuracy_study_r3.json ] || mv benchmarks/accuracy_study.json benchmarks/accuracy_study_r3.json 2>/dev/null
timeout 7200 python benchmarks/accuracy_study.py
echo "=== stencil fast path ==="
timeout 1800 python benchmarks/stencil_bench.py
echo "=== ell_bench (gather vs block-banded vs auto routing) ==="
timeout 3600 python benchmarks/ell_bench.py
echo "CHIP QUEUE4 DONE"
