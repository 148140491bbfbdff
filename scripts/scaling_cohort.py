#!/usr/bin/env python
"""Measured scale-up proof for ``rollups.events_cohort_retention``
(SCALING.md) — the "sf1-scale" run pinning the same-key-reuse claim.

Corpus growth: k copies of the sf0.1 events table with DISJOINT user
populations (user_id shifted per copy, timestamps untouched). Each
copy reproduces the base cohort structure exactly, so the retention
matrix keeps the SAME (cohort, offset) rows while every
``n_active_users`` count is exactly multiplier x its base value — the
constant-dup-rate discipline of the dedup curves applied to the events
dimension. Wall should be ~linear: first-seen is one shuffle on
user_id, the activity join reuses the same key, and only (user,
epoch-day) pairs move after the first projection.

Usage: python scripts/scaling_cohort.py [multipliers...]
Prints one JSON line per scale plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_minhash import cpu_seconds, peak_mem_mb  # noqa: E402

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
USER_OFFSET = 10_000_000  # > any fixture user_id; keeps populations disjoint


def build_scaled_events(spark, multiplier: int) -> str:
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    base = load_table(spark, BASE_SF_DIR, "events")
    parts = [
        base.select(
            (F.col("event_id") + F.lit(k * USER_OFFSET)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * USER_OFFSET)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(multiplier)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    d = tempfile.mkdtemp(prefix=f"hha_scale_events_{multiplier}x_")
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.rollups import (
        events_cohort_retention,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-scaling-cohort", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            samples = []
            df = None
            for _ in range(2):
                t0 = time.perf_counter()
                cpu0 = cpu_seconds(spark)
                df = events_cohort_retention(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            agg = df.agg(
                F.count("*").alias("rows"),
                F.sum("n_active_users").alias("active_sum"),
            ).collect()[0]
            row = {
                "multiplier": m,
                "events": 100_000 * m,
                "matrix_rows": agg["rows"],
                "active_sum": agg["active_sum"],
                "wall_sec": best["wall_sec"],
                "cpu_sec": best["cpu_sec"],
                "samples": samples,
                "peak_mem_mb": peak_mem_mb(spark),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        a, b = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": {
                        "data_ratio": b["multiplier"] / a["multiplier"],
                        "wall_ratio": round(b["wall_sec"] / a["wall_sec"], 2),
                        # disjoint user populations reproduce the base
                        # cohort structure: same matrix rows, counts
                        # EXACTLY linear
                        "matrix_rows_constant": all(
                            r["matrix_rows"] == a["matrix_rows"] for r in results
                        ),
                        "active_exactly_linear": all(
                            r["active_sum"] == a["active_sum"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
