#!/bin/bash
set -x
cd /root/repo
python - <<'PY'
import json, pathlib
p = pathlib.Path("benchmarks/results.json")
d = json.loads(p.read_text())
# re-measure the 1-matvec symdia rows at the new tile
for k in list(d["configs"]):
    if k.startswith("symdia_") and "pipe_pr" not in k:
        del d["configs"][k]
p.write_text(json.dumps(d, indent=1))
PY
for v in hs_cg cg_cg m_cg gv_cg pr_cg pipe_p_cg pipe_p_m_cg hs_pcg cg_pcg gv_pcg pr_pcg; do
  timeout 2400 python benchmarks/run_all.py --fmt symdia --variants $v
done
timeout 3000 python bench.py
echo "QUEUE H COMPLETE"
