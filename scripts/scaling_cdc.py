#!/usr/bin/env python
"""Measured scale-up proof for the CDC pair (SCALING.md):
``events.events_latest_state`` and ``events.events_scd2_intervals``.

Corpus growth: disjoint-user-population copies of the sf0.1 events
table (``scaling_cohort.build_scaled_events``). Each copy reproduces
the base change-log structure exactly, so latest-state rows and SCD2
interval rows are both EXACTLY multiplier x base — and latest-state's
struct-max partial aggregate should show the flattest curve in the
repo (the shuffle moves keys, not history).

Usage: python scripts/scaling_cdc.py [multipliers...]
Prints one JSON line per scale plus a summary line.
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
        events_latest_state,
        events_scd2_intervals,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-scaling-cdc", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "latest_state": events_latest_state,
        "scd2_intervals": events_scd2_intervals,
    }
    results = []
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            row = {"multiplier": m, "events": 100_000 * m}
            for name, fn in ops.items():
                samples = []
                df = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    cpu0 = cpu_seconds(spark)
                    df = fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(
                        {
                            "wall_sec": round(time.perf_counter() - t0, 3),
                            "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                        }
                    )
                best = min(samples, key=lambda s: s["wall_sec"])
                row[name] = {
                    "rows": df.count(),
                    "wall_sec": best["wall_sec"],
                    "cpu_sec": best["cpu_sec"],
                    "samples": samples,
                }
            row["peak_mem_mb"] = peak_mem_mb(spark)
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
                        "latest_wall_ratio": round(
                            b["latest_state"]["wall_sec"]
                            / a["latest_state"]["wall_sec"],
                            2,
                        ),
                        "scd2_wall_ratio": round(
                            b["scd2_intervals"]["wall_sec"]
                            / a["scd2_intervals"]["wall_sec"],
                            2,
                        ),
                        "rows_exactly_linear": all(
                            r["latest_state"]["rows"]
                            == a["latest_state"]["rows"] * r["multiplier"]
                            and r["scd2_intervals"]["rows"]
                            == a["scd2_intervals"]["rows"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
