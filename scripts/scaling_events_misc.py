#!/usr/bin/env python
"""Measured scale-up for the staged events analytics (SCALING.md):
conversion funnel, robust outliers, OHLC bars, rolling stats.

Disjoint-user-population copies of the sf0.1 events table
(``scaling_cohort.build_scaled_events``): funnel step counts and
rolling/OHLC/outlier row counts scale exactly with the multiplier
(timestamps untouched, user populations disjoint), except OHLC whose
(type, hour) bar KEYS are shared across copies — its row count stays
CONSTANT while volumes scale exactly (asserted).

Usage: python scripts/scaling_events_misc.py [multipliers...]
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
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.events import (
        events_conversion_funnel,
        events_robust_outliers,
        events_rolling_stats,
    )
    from hadoop_hive_analysis_spark.operators.rollups import events_ohlc_bars
    from hadoop_hive_analysis_spark.session import (
        get_spark,
        release_cached_blocks,
    )

    spark = get_spark(
        "hha-scaling-events-misc", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "conversion_funnel": events_conversion_funnel,
        "robust_outliers": events_robust_outliers,
        "ohlc_bars": events_ohlc_bars,
        "rolling_stats": events_rolling_stats,
    }
    results = []
    for m in multipliers:
        d = build_scaled_events(spark, m)
        try:
            row = {"multiplier": m, "events": 100_000 * m}
            for name, fn in ops.items():
                samples = []
                n_rows = None
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
                    # count BEFORE release: checkpoint-backed frames are
                    # unrecomputable once their blocks are freed
                    n_rows = df.count()
                    # untimed: fresh-JVM block state per sample
                    release_cached_blocks(spark)
                best = min(samples, key=lambda s: s["wall_sec"])
                row[name] = {
                    "rows": n_rows,
                    "wall_sec": best["wall_sec"],
                    "cpu_sec": best["cpu_sec"],
                }
            # volume invariant for the shared-key OHLC bars
            row["ohlc_total_volume"] = int(
                events_ohlc_bars(spark, d).agg(F.sum("volume")).first()[0]
            )
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
                        "wall_ratios": {
                            k: round(b[k]["wall_sec"] / a[k]["wall_sec"], 2)
                            for k in (
                                "conversion_funnel",
                                "robust_outliers",
                                "ohlc_bars",
                                "rolling_stats",
                            )
                        },
                        # cross-multiplied: correct for any base multiplier
                        "rolling_rows_exactly_linear": all(
                            r["rolling_stats"]["rows"] * a["multiplier"]
                            == a["rolling_stats"]["rows"] * r["multiplier"]
                            for r in results
                        ),
                        "ohlc_bars_constant_volume_linear": all(
                            r["ohlc_bars"]["rows"] == a["ohlc_bars"]["rows"]
                            and r["ohlc_total_volume"] * a["multiplier"]
                            == a["ohlc_total_volume"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
