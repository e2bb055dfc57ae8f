#!/bin/bash
set -x
cd /root/repo
timeout 3000 python benchmarks/chip_trace.py
timeout 2400 python benchmarks/ell_kernel_check.py
echo "QUEUE C COMPLETE"
