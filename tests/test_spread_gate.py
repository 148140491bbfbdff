"""Spread-gate branch instrumentation (judge r15 item 7).

``sources.catalog.spread_small_scan`` estimates achievable scan
parallelism STATICALLY from parquet footers; the dynamic
``df.rdd.getNumPartitions()`` probe survives only as a fallback for
non-file sources, because it compiles an extra physical plan on every
operator call. A footer-parse regression that silently demoted parquet
scans to the fallback would reintroduce that per-call planning cost with
no functional symptom — so the branch taken is now counted
(``SPREAD_GATE_STATS``) and these tests pin the contract:

- a parquet-backed frame takes the static branch, never the fallback;
- a non-file frame takes the fallback (the counter moves, proving the
  instrumentation observes the path that a regression would take).
"""

from __future__ import annotations

import os

from hadoop_hive_analysis_spark.sources.catalog import (
    SPREAD_GATE_STATS,
    spread_small_scan,
)


def test_parquet_scan_takes_static_branch(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    before = dict(SPREAD_GATE_STATS)
    out = spread_small_scan(df)
    assert SPREAD_GATE_STATS["static"] == before["static"] + 1
    assert SPREAD_GATE_STATS["fallback"] == before["fallback"], (
        "parquet path fell back to the dynamic probe — footer parse "
        "regressed (per-call physical planning is back)"
    )
    # the spread result stays a usable frame either way
    assert out.columns == df.columns


def test_static_branch_memoizes_repeat_calls(spark, sf_dir):
    """Repeat calls on the same fixture stay on the static branch (the
    verdict cache makes them ~free); the fallback counter never moves."""
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    before = dict(SPREAD_GATE_STATS)
    for _ in range(3):
        spread_small_scan(df)
    assert SPREAD_GATE_STATS["static"] == before["static"] + 3
    assert SPREAD_GATE_STATS["fallback"] == before["fallback"]


def test_non_file_source_takes_fallback(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    before = dict(SPREAD_GATE_STATS)
    spread_small_scan(df)
    assert SPREAD_GATE_STATS["fallback"] == before["fallback"] + 1
    assert SPREAD_GATE_STATS["static"] == before["static"]
