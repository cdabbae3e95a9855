"""Unit test for the nesting-aware Chrome-trace parser
(benchmarks/profile_step.parse_trace).

The r4 profiler double-counted nested device spans (a ``conditional``
wrapper from the pad-step gate spans its branch's leaf ops, so op-sum came
out 2x the wall).  The parser now charges each span only its EXCLUSIVE
(self) time via a per-track interval stack; this test pins that semantics
on a hand-built trace with known nesting.
"""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_step import parse_trace  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    meta = [{"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "process_name", "pid": 9,
             "args": {"name": "python host"}}]
    path = d / "vm.trace.json.gz"
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": meta + events}, f)
    return str(tmp_path)


def test_nested_spans_charge_exclusive_time(tmp_path):
    # track layout (us):  while.1 [0, 100)
    #   conditional.2 [10, 70) wrapping fusion.a [10, 40) + fusion.b [45, 70)
    #   fusion.c [75, 95)
    ev = [
        {"ph": "X", "pid": 1, "tid": 0, "name": "while.1", "ts": 0.0,
         "dur": 100.0},
        {"ph": "X", "pid": 1, "tid": 0, "name": "conditional.2", "ts": 10.0,
         "dur": 60.0},
        {"ph": "X", "pid": 1, "tid": 0, "name": "fusion.a", "ts": 10.0,
         "dur": 30.0},
        {"ph": "X", "pid": 1, "tid": 0, "name": "fusion.b", "ts": 45.0,
         "dur": 25.0},
        {"ph": "X", "pid": 1, "tid": 0, "name": "fusion.c", "ts": 75.0,
         "dur": 20.0},
        # host-track event must be ignored entirely
        {"ph": "X", "pid": 9, "tid": 0, "name": "fusion.host", "ts": 0.0,
         "dur": 999.0},
    ]
    rows, wall = parse_trace(_write_trace(tmp_path, ev), n_steps=1)
    by_name = {n: ms for ms, _, n in rows}
    # leaves keep their full duration (us -> ms)
    assert abs(by_name["fusion.a"] - 0.030) < 1e-9
    assert abs(by_name["fusion.b"] - 0.025) < 1e-9
    assert abs(by_name["fusion.c"] - 0.020) < 1e-9
    # wrapper spans (while/conditional) are excluded from the table
    assert "conditional.2" not in by_name and "while.1" not in by_name
    assert "fusion.host" not in by_name
    # wall total comes from the while span
    assert abs(wall - 0.100) < 1e-9
    # op-sum <= wall: no double counting under the conditional
    assert sum(by_name.values()) <= wall + 1e-9


def test_repeated_steps_average_per_step(tmp_path):
    ev = []
    for s in range(4):
        t0 = 1000.0 * s
        ev.append({"ph": "X", "pid": 1, "tid": 0, "name": "fusion.k",
                   "ts": t0, "dur": 8.0})
        ev.append({"ph": "X", "pid": 1, "tid": 0, "name": "copy.k",
                   "ts": t0 + 10.0, "dur": 2.0})
    rows, _ = parse_trace(_write_trace(tmp_path, ev), n_steps=4)
    by_name = {n: (ms, c) for ms, c, n in rows}
    assert abs(by_name["fusion.k"][0] - 0.008) < 1e-9
    assert by_name["fusion.k"][1] == 4
    assert abs(by_name["copy.k"][0] - 0.002) < 1e-9
