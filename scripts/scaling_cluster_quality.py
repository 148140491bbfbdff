#!/usr/bin/env python
"""Measured scale-up for ``dedup_cluster_quality`` (SCALING.md).

Constant-dup-rate renamed-copy growth (the scaling_minhash builder):
in-copy MinHash clusters replicate per copy, cross-copy overlap is
zero, so cluster count should be exactly linear and per-cluster stats
identical across copies. The audit's cost is the pair path it audits
plus component-table-sized aggregates — the wall should track the
measured MinHash curve, not add to it.

Usage: python scripts/scaling_cluster_quality.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_minhash import build_scaled_corpus, cpu_seconds, peak_mem_mb  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.components import (
        dedup_cluster_quality,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    heap = os.environ.get("HHA_SCALE_HEAP", "8g")
    spark = get_spark(
        "hha-scaling-cluster-quality",
        extra_conf={"spark.driver.memory": heap},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            samples = []
            df = None
            for _ in range(2):
                t0 = time.perf_counter()
                c0 = cpu_seconds(spark)
                df = dedup_cluster_quality(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - c0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            agg = df.agg(
                F.count(F.lit(1)).alias("clusters"),
                F.sum(F.col("chained").cast("long")).alias("chained"),
                F.min("min_jaccard_ppm").alias("worst_ppm"),
            ).first()
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "clusters": agg["clusters"],
                "chained": agg["chained"],
                "worst_jaccard_ppm": agg["worst_ppm"],
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
                        "size_growth": b["multiplier"] / a["multiplier"],
                        "wall_growth": round(b["wall_sec"] / a["wall_sec"], 2),
                        "clusters_linear": b["clusters"]
                        == a["clusters"] * b["multiplier"] // a["multiplier"],
                    }
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
