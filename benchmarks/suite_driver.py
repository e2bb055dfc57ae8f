"""Sequential driver for the benchmark suite.

Remote compiles run minutes per program, so the suite is executed one
variant per subprocess (results merge into ``results.json`` via
run_all's resume logic); a per-variant timeout bounds a stuck compile
without losing completed measurements.  STRICTLY one device process at
a time (PERF.md methodology note 4).
"""

import pathlib
import subprocess
import sys

VARIANTS = ["pipe_pr_cg", "hs_cg", "cg_cg", "m_cg", "gv_cg", "pr_cg",
            "pipe_p_cg"]
HERE = pathlib.Path(__file__).resolve().parent


def main():
    for v in VARIANTS:
        print(f"=== {v} ===", flush=True)
        try:
            subprocess.run(
                [sys.executable, str(HERE / "run_all.py"), "--variants", v],
                timeout=1500, check=False,
            )
        except subprocess.TimeoutExpired:
            print(f"{v}: timed out (compile too slow) — skipping", flush=True)
    # final pass for the parity config (cheap, CPU-path)
    subprocess.run(
        [sys.executable, str(HERE / "run_all.py"), "--variants", "none"],
        timeout=1500, check=False,
    )
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
