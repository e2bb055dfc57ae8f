#!/bin/bash
# Round-5 chip queue B: one device job at a time.
set -x
cd /root/repo
python - <<'PY'
import json, pathlib
p = pathlib.Path("benchmarks/results.json")
d = json.loads(p.read_text())
d["configs"] = {k: v for k, v in d["configs"].items() if "symdia" not in k}
p.write_text(json.dumps(d, indent=1))
PY
timeout 2400 python benchmarks/symdia_fused_check.py
for v in pipe_pr_cg hs_cg pr_cg gv_cg cg_cg pipe_pr_pcg; do
  timeout 2400 python benchmarks/run_all.py --fmt symdia --variants $v
done
timeout 3000 python bench.py
timeout 3000 python bench.py
timeout 3600 python benchmarks/f32x2_cost.py
timeout 3600 python benchmarks/bf16_study.py
timeout 2400 python benchmarks/spectrum_bench.py hs_cg_f32x2
timeout 7200 python benchmarks/accuracy_study.py
echo "QUEUE B COMPLETE"
