#!/usr/bin/env python
"""Measured scale-up proof for ``events_gap_fill`` and
``events_merge_upsert`` (SCALING.md) — r9 driver-promotion candidates.

Corpus growth: disjoint-user-population copies of the sf0.1 events
table (``scaling_cohort.build_scaled_events``) — the time RANGE stays
constant while event volume grows, which separates the two cost terms:

- gap_fill: the dense grid is (types × buckets of the range) —
  CONSTANT under this growth, so grid rows must stay exactly constant
  while only the one partial-agg pass over raw events grows; the wall
  curve measures that pass.
- merge_upsert: per-user latest-state structure reproduces per copy
  (disjoint users), so output rows and the op mix are EXACTLY linear;
  the struct-max sides shuffle keys, not history — the latest-state
  FLAT-curve claim extended through the full-outer join.

Usage: python scripts/scaling_gapfill_merge.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_cohort import build_scaled_events  # noqa: E402
from scaling_minhash import cpu_seconds, peak_mem_mb  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from hadoop_hive_analysis_spark.operators.events import (
        events_gap_fill,
        events_merge_upsert,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-gapfill-merge", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            out = {"multiplier": m, "events": 100_000 * m}
            for name, fn in [
                ("gap_fill", events_gap_fill),
                ("merge", events_merge_upsert),
            ]:
                samples = []
                df = None
                for _ in range(2):
                    t0, c0 = time.perf_counter(), cpu_seconds(spark)
                    df = fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(
                        {
                            "wall": round(time.perf_counter() - t0, 3),
                            "cpu": round(cpu_seconds(spark) - c0, 2),
                        }
                    )
                out[name] = min(samples, key=lambda x: x["wall"])
                out[name + "_rows"] = df.count()
            out["peak_mem_mb"] = peak_mem_mb(spark)
            results.append(out)
            print(json.dumps(out), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        a, b = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": {
                        "metric": "gapfill_merge_scaling",
                        "data_ratio": b["multiplier"] / a["multiplier"],
                        "gap_fill_wall_ratio": round(
                            b["gap_fill"]["wall"] / a["gap_fill"]["wall"], 2
                        ),
                        "merge_wall_ratio": round(
                            b["merge"]["wall"] / a["merge"]["wall"], 2
                        ),
                        # constant time range => grid exactly constant
                        "grid_rows_constant": all(
                            r["gap_fill_rows"] == a["gap_fill_rows"]
                            for r in results
                        ),
                        # disjoint users => merge output exactly linear
                        "merge_rows_exactly_linear": all(
                            r["merge_rows"] * a["multiplier"]
                            == a["merge_rows"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
