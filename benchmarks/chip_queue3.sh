#!/bin/bash
# Round-3 serial chip queue — ONE device process at a time, nothing
# CPU-heavy concurrent (PERF.md methodology note 4; the round-3 first
# suite run was corrupted by exactly that).  Every arm is bounded by
# timeout; ell_bench (the only crash-risk arm, now guarded) runs last.
cd /root/repo
echo "=== bench.py (headline @ HEAD) ==="
timeout 1800 python bench.py
echo "=== breadth suite (fresh, fused paths, min-of-trials) ==="
mv -f benchmarks/results.json benchmarks/results_r3_stalled.json 2>/dev/null
timeout 7200 python benchmarks/suite_driver.py
echo "=== spectrum (mpi4py configuration) ==="
timeout 1800 python benchmarks/spectrum_bench.py
echo "=== accuracy study (5 matrices, f32 vs compensated) ==="
timeout 3600 python benchmarks/accuracy_study.py
echo "=== chip trace (per-phase breakdown) ==="
timeout 1800 python benchmarks/chip_trace.py
echo "=== ell_bench (incl. 524k crash diagnosis, guarded) ==="
timeout 3600 python benchmarks/ell_bench.py
echo "=== ell_bench second consecutive run (VERDICT done-criterion) ==="
timeout 3600 python benchmarks/ell_bench.py
echo "CHIP QUEUE3 DONE"
