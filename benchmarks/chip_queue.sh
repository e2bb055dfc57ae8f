#!/bin/bash
# Serial on-chip measurement queue — ONE device process at a time
# (PERF.md methodology note 4). Waits for the breadth suite to finish.
cd /root/repo
while ! grep -q "suite complete" benchmarks/suite_run2.log 2>/dev/null; do sleep 15; done
echo "=== bench.py (headline re-check) ==="
timeout 1500 python bench.py
echo "=== ell_bench ==="
timeout 1800 python benchmarks/ell_bench.py
echo "=== accuracy_f32 ==="
timeout 1500 python benchmarks/accuracy_f32.py
echo "=== diag_full_fused ==="
timeout 1800 python benchmarks/diag_full_fused.py
echo "CHIP QUEUE DONE"
