#!/bin/bash
# Serial chip queue: pallas read ceiling, then fused-tile A/B on the headline
cd /root/repo
echo "=== pallas_ceiling ==="
timeout 1200 python benchmarks/pallas_ceiling.py
echo "=== bench tile=4096 ==="
NCGV_FUSED_TILE=4096 timeout 1200 python bench.py
echo "=== bench tile=1024 ==="
NCGV_FUSED_TILE=1024 timeout 1200 python bench.py
echo "=== bench default (2048) recheck ==="
timeout 1200 python bench.py
echo "QUEUE2 DONE"
