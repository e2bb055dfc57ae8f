#!/bin/bash
set -x
cd /root/repo
timeout 2400 python benchmarks/symdia_fused_check.py
timeout 3000 python bench.py
timeout 3000 python bench.py
timeout 3600 python benchmarks/bf16_study.py
timeout 7200 python benchmarks/accuracy_study.py
echo "QUEUE E COMPLETE"
