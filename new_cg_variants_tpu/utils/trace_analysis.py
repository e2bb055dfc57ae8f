"""Post-hoc trace analysis: the ``-log_view`` parsing analog.

The reference times its PETSc runs with ``-log_view ::xml`` and *parses*
the event tree into per-phase fractions for its scaling plots
(``scaling_experiments_petsc/strong_scaling_plots.py:43-59`` reads the
XML, buckets MatMult / VecDot / VecAXPY / PCApply, and stacks them).
The XLA equivalent of that event log is the profiler trace written by
:func:`new_cg_variants_tpu.utils.profiling.trace` (Chrome trace-format
JSON under ``<log_dir>/plugins/profile/<run>/``).  This module parses it
back into the same kind of per-phase table:

* :func:`load_trace_events` — newest ``*.trace.json.gz`` under a trace
  directory -> list of complete events (name, dur, pid/tid lane).
* :func:`op_breakdown` — aggregate device-lane events by op name:
  total time, call count, fraction.
* :func:`phase_breakdown` — bucket ops into solver phases (spmv /
  dots+reductions / vector updates / collectives / other) via name
  patterns, mirroring the reference's MatMult / VecDot / VecAXPY /
  VecScatter buckets.
* :func:`format_table` — printable report.

Works on any backend the profiler supports (CPU lanes in tests, TPU
lanes on chip); on-chip usage is one ``with trace(dir): chunk(...)``
around a steady-state chunk, then ``phase_breakdown`` on the directory.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from collections import defaultdict

__all__ = [
    "load_trace_events",
    "op_breakdown",
    "phase_breakdown",
    "format_table",
    "PHASE_PATTERNS",
]

# Solver-phase buckets <- XLA/Mosaic op-name patterns.  Mirrors the
# reference's PETSc event buckets: MatMult -> spmv, VecDot/VecMDot +
# MPI_Allreduce -> dots, VecAXPY-class -> vector, VecScatter -> comm.
# Pallas kernels lower to Mosaic custom-calls whose trace events carry
# the HLO name (``custom-call[.N]``) rather than the kernel symbol —
# in this framework every Pallas kernel IS the (fused) SpMV pass, so
# custom-calls land in the spmv bucket (round-3 lesson: 67.8% of device
# time fell into "other" because only the python-side names matched).
PHASE_PATTERNS = [
    ("spmv", re.compile(
        r"dia_spmv|spmv|full_step|fused_pipe|block_banded|einsum|dot_general|"
        r"gather|custom-call|tpu_custom_call|mosaic|pallas", re.I)),
    ("dots/reduce", re.compile(r"reduce|dots", re.I)),
    ("collectives", re.compile(
        r"all-reduce|all-gather|collective-permute|reduce-scatter|psum|"
        r"ppermute", re.I)),
    ("vector", re.compile(r"fusion|add|subtract|multiply|axpy|copy|"
                          r"select|compare|broadcast", re.I)),
]


def _newest_trace_file(log_dir: str) -> str:
    pats = [
        os.path.join(log_dir, "**", "*.trace.json.gz"),
        os.path.join(log_dir, "**", "*.trace.json"),
    ]
    hits: list[str] = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
    if not hits:
        raise FileNotFoundError(f"no trace.json[.gz] under {log_dir}")
    return max(hits, key=os.path.getmtime)


def load_trace_events(log_dir: str) -> list[dict]:
    """All complete ('X') events of the newest trace under ``log_dir``.

    Each event keeps ``name``, ``dur`` (us), and its ``lane`` (the
    process/thread name when present — device lanes are the ones whose
    process name mentions the accelerator or XLA modules).
    """
    path = _newest_trace_file(log_dir)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        doc = json.load(f)
    raw = doc["traceEvents"] if isinstance(doc, dict) else doc

    # metadata: pid/tid -> human lane names
    pnames: dict = {}
    tnames: dict = {}
    for ev in raw:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pnames[ev.get("pid")] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")

    out = []
    for ev in raw:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        # keep process and thread lane names SEPARATE: a TPU trace has one
        # device process with several thread lanes (XLA Modules = one
        # event per compiled program, XLA Ops = one per HLO op, Steps,
        # ...) that each cover the same wall time — collapsing them into
        # one lane triple-counts device time (the round-3 chip trace
        # reported 0.725 ms/iter against bench.py's 0.245 exactly that way)
        out.append({
            "name": ev.get("name", ""),
            "dur": float(ev["dur"]),
            "lane": pnames.get(pid, "") or tnames.get((pid, tid), ""),
            "thread": tnames.get((pid, tid), ""),
        })
    return out


_DEVICE_LANE = re.compile(r"TPU|GPU|/device:|XLA Ops|XLA Modules", re.I)

# CPU-backend traces have ONE /host:CPU lane mixing XLA ops with Python
# frames ($file.py:line), jit dispatch, and compilation; drop those so
# the fallback breakdown still reflects compute, not the host runtime.
_HOST_NOISE = re.compile(
    r"^\$|PjitFunction|cache_miss|_pjit|compil|from_hlo|reraise|"
    r"XlaComputation|backend_|TaskDispatcher|Codegen|Thunk|Pass|"
    r"Canonicalizer|Inliner|Lower|LLVM|HLO passes|simplification|"
    r"sharding_computation|mlir", re.I)


_OPS_THREAD = re.compile(r"XLA Ops|TensorFlow Ops", re.I)
_NON_OP_THREAD = re.compile(r"XLA Modules|Steps|Framework|Source|Scoped|"
                            r"Host Threads", re.I)

# Control-flow WRAPPER events (`while.N`, `condition`/`body` calls): their
# duration covers every op executed inside them, so counting them next to
# the member ops doubles the total (round-4 chip trace: a single while.10
# event carried 50% of "device time" — all of it re-counted body work).
_WRAPPER_OP = re.compile(r"^(while|condition|body|call)[\.\d]*$", re.I)


def _device_events(events: list[dict]) -> list[dict]:
    dev = [e for e in events if _DEVICE_LANE.search(e["lane"] or "")
           or _DEVICE_LANE.search(e.get("thread", "") or "")]
    if dev:
        # one trace carries several overlapping views of the same device
        # time; use ONLY the per-op thread lane when present, else drop
        # the known whole-program/step summary lanes
        ops = [e for e in dev if _OPS_THREAD.search(e.get("thread", "") or "")]
        if not ops:
            ops = [e for e in dev
                   if not _NON_OP_THREAD.search(e.get("thread", "") or "")]
        return [e for e in ops if not _WRAPPER_OP.match(e["name"])]
    return [e for e in events if not _HOST_NOISE.search(e["name"])]


def op_breakdown(events: list[dict], top: int = 20) -> list[dict]:
    """Aggregate device-lane events by op name, sorted by total time."""
    agg: dict = defaultdict(lambda: [0.0, 0])
    for e in _device_events(events):
        a = agg[e["name"]]
        a[0] += e["dur"]
        a[1] += 1
    total = sum(v[0] for v in agg.values()) or 1.0
    rows = [
        {"name": k, "total_us": v[0], "count": v[1], "frac": v[0] / total}
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:top]


def phase_breakdown(events_or_dir) -> dict:
    """Per-phase time fractions (the reference's stacked-event analog).

    Accepts a trace directory or a pre-loaded event list.  Ops are
    assigned to the FIRST matching phase pattern; unmatched time lands
    in ``other``.
    """
    events = (
        load_trace_events(events_or_dir)
        if isinstance(events_or_dir, (str, os.PathLike))
        else events_or_dir
    )
    sums: dict = defaultdict(float)
    for e in _device_events(events):
        for phase, pat in PHASE_PATTERNS:
            if pat.search(e["name"]):
                sums[phase] += e["dur"]
                break
        else:
            sums["other"] += e["dur"]
    total = sum(sums.values()) or 1.0
    return {
        "total_us": total,
        "phases": {k: {"us": v, "frac": v / total} for k, v in sorted(
            sums.items(), key=lambda kv: -kv[1])},
    }


def format_table(breakdown: dict) -> str:
    """Printable per-phase report (one line per phase)."""
    lines = [f"device time: {breakdown['total_us']/1e3:.3f} ms"]
    for phase, row in breakdown["phases"].items():
        lines.append(
            f"  {phase:<12s} {row['us']/1e3:10.3f} ms  {row['frac']*100:5.1f}%"
        )
    return "\n".join(lines)
