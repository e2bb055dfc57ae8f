"""Trace-analysis parity: the -log_view parsing analog actually parses.

The reference's scaling plots re-read PETSc's event log into per-phase
fractions (strong_scaling_plots.py:43-59); here the jax.profiler trace
is the event log and utils/trace_analysis.py the parser.  The test
records a real (CPU-lane) trace of a solver chunk and checks the parsed
structure, so an XLA/profiler format change is caught in CI rather than
on-chip.
"""

import numpy as np
import pytest

import new_cg_variants_tpu as cgt
from new_cg_variants_tpu.utils.profiling import trace
from new_cg_variants_tpu.utils.trace_analysis import (
    format_table,
    load_trace_events,
    op_breakdown,
    phase_breakdown,
)


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trace")
    op, b, _ = cgt.banded_model(4096, k=8)
    try:
        with trace(str(d)):
            out = cgt.run("pipe_pr_cg", op, np.asarray(b), max_iter=25)
            float(np.asarray(out["x"][0]))  # drain before stop_trace
    except Exception as e:  # profiler unavailable in some sandboxes
        pytest.skip(f"profiler unavailable: {e!r}")
    return str(d)


def test_events_parse(trace_dir):
    events = load_trace_events(trace_dir)
    assert len(events) > 10
    assert all("name" in e and e["dur"] >= 0 for e in events)


def test_op_breakdown_sorted(trace_dir):
    rows = op_breakdown(load_trace_events(trace_dir), top=10)
    assert rows and rows[0]["total_us"] >= rows[-1]["total_us"]
    fracs = [r["frac"] for r in rows]
    assert all(0 <= f <= 1 for f in fracs)


def test_phase_breakdown_table(trace_dir):
    bd = phase_breakdown(trace_dir)
    assert bd["total_us"] > 0
    # every fraction well-formed and the buckets sum to 1
    fr = [row["frac"] for row in bd["phases"].values()]
    assert abs(sum(fr) - 1.0) < 1e-6
    txt = format_table(bd)
    assert "device time" in txt and "%" in txt
