"""Unit tests for bench.py's regression flagger (no SparkSession needed).

The flagger reads the newest BENCH_r*.json next to bench.py; these tests
point it at a temp dir via monkeypatched __file__ so repo artifacts don't
leak into assertions.
"""

from __future__ import annotations

import json
import os

import bench


def _run(tmp_path, monkeypatch, prior_queries, timings, sf=0.1):
    with open(tmp_path / "BENCH_r01.json", "w") as f:
        json.dump({"sf": sf, "queries": prior_queries}, f)
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    return bench._regressions_vs_prior(timings, sf)


def test_uniform_host_slowdown_not_flagged(tmp_path, monkeypatch):
    prior = {f"q{i}": 1.0 for i in range(10)}
    now = {f"q{i}": 1.45 for i in range(10)}  # whole pack 1.45x: host, not plans
    out = _run(tmp_path, monkeypatch, prior, now)
    assert out.pop("_host_speed_factor") == 1.45
    assert out == {}


def test_relative_regression_flagged_under_slow_host(tmp_path, monkeypatch):
    prior = {f"q{i}": 1.0 for i in range(10)}
    now = {f"q{i}": 1.4 for i in range(9)}
    now["q9"] = 2.8  # 2.8x absolute = 2.0x vs the 1.4x pack median
    out = _run(tmp_path, monkeypatch, prior, now)
    out.pop("_host_speed_factor")
    assert list(out) == ["q9"]
    assert out["q9"]["ratio"] == 2.8
    assert out["q9"]["ratio_vs_pack"] == 2.0


def test_fast_host_does_not_mask_regression(tmp_path, monkeypatch):
    # Pack median 0.7x (faster host): norm clamps at 1.0 so a 1.3x query
    # still flags — a faster host must never excuse a slower plan.
    prior = {f"q{i}": 1.0 for i in range(10)}
    now = {f"q{i}": 0.7 for i in range(9)}
    now["q9"] = 1.3
    out = _run(tmp_path, monkeypatch, prior, now)
    out.pop("_host_speed_factor")
    assert list(out) == ["q9"]


def test_nonnumeric_suffix_artifacts_skipped(tmp_path, monkeypatch):
    with open(tmp_path / "BENCH_rerun.json", "w") as f:
        f.write("not json")
    out = _run(tmp_path, monkeypatch, {"q0": 1.0}, {"q0": 1.0})
    assert out.pop("_host_speed_factor") == 1.0
    assert out == {}


def test_no_prior_artifact(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._regressions_vs_prior({"q0": 1.0}, 0.1) == {}
