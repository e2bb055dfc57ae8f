"""Sequential driver for the benchmark suite.

Remote compiles run minutes per program, so the suite is executed one
variant per subprocess (results merge into ``results.json`` via
run_all's resume logic); a per-variant timeout bounds a stuck compile
without losing completed measurements.  STRICTLY one device process at
a time (PERF.md methodology note 4).
"""

import json
import pathlib
import subprocess
import sys

VARIANTS = ["pipe_pr_cg", "hs_cg", "cg_cg", "m_cg", "gv_cg", "pr_cg",
            "pipe_p_cg", "pipe_p_m_cg", "pipe_pr_m_cg",
            "hs_pcg", "cg_pcg", "gv_pcg", "pr_pcg", "pipe_pr_pcg"]
#: the symmetric half-band (production storage) rows, keyed
#: ``symdia_<variant>`` in results.json
SYMDIA_VARIANTS = ["pipe_pr_cg", "hs_cg", "pr_cg", "gv_cg", "cg_cg",
                   "pipe_pr_pcg"]
HERE = pathlib.Path(__file__).resolve().parent


def main():
    # resume: a variant already in results.json is NOT re-measured (an
    # interrupted queue re-run continues where it stopped; delete the
    # file or a key to force a fresh measurement)
    done = set()
    try:
        done = set(json.loads((HERE / "results.json").read_text())["configs"])
    except Exception:
        pass
    runs = [(v, []) for v in VARIANTS] + [
        ("symdia_" + v, ["--fmt", "symdia", "--variants", v])
        for v in SYMDIA_VARIANTS
    ]
    for key, extra in runs:
        v = key.split("symdia_")[-1]
        if key in done:
            print(f"=== {key} === (already measured, skipping)", flush=True)
            continue
        print(f"=== {key} ===", flush=True)
        try:
            subprocess.run(
                [sys.executable, str(HERE / "run_all.py")]
                + (extra or ["--variants", v]),
                timeout=1500, check=False,
            )
        except subprocess.TimeoutExpired:
            print(f"{key}: timed out (compile too slow) — skipping",
                  flush=True)
    # final pass for the parity config (cheap, CPU-path)
    subprocess.run(
        [sys.executable, str(HERE / "run_all.py"), "--variants", "none"],
        timeout=1500, check=False,
    )
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
