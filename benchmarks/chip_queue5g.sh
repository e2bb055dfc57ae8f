#!/bin/bash
set -x
cd /root/repo
timeout 2400 python benchmarks/df_kernel_check.py
timeout 3600 python benchmarks/f32x2_cost.py
for v in m_cg pipe_p_cg pipe_p_m_cg pipe_pr_m_cg hs_pcg cg_pcg gv_pcg pr_pcg; do
  timeout 2400 python benchmarks/run_all.py --fmt symdia --variants $v
done
echo "QUEUE G COMPLETE"
