#!/usr/bin/env python
"""Measured scale-up proof for ``dedup.span_scrub`` (SCALING.md).

Same constant-dup-rate corpus growth as ``scaling_minhash.py`` (renamed
copies of the sf0.1 documents table: the per-copy vocabulary rename is a
bijection on spans, so every copy's internal duplicated-span structure —
and therefore its REMOVAL set — is preserved exactly, with zero
cross-copy span overlap). Total removed tokens must be EXACTLY
multiplier x base_removed; the wall curve should be ~linear (span
explode + one shuffle on span_h + per-doc interval fold, no pair
enumeration anywhere).

Usage: python scripts/scaling_spanscrub.py [multipliers...]
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

from scaling_minhash import build_scaled_corpus, cpu_seconds, peak_mem_mb  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.dedup import span_scrub
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-scaling-spanscrub", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            # Per-run (wall, cpu) samples — the reported pair describes the
            # best-wall run; the removal rollup runs after both timed runs.
            samples = []
            df = None
            for _ in range(2):
                t0 = time.perf_counter()
                cpu0 = cpu_seconds(spark)
                df = span_scrub(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            agg = df.agg(
                F.sum("n_removed").alias("removed"),
                F.sum((F.col("n_removed") > 0).cast("long")).alias("scrubbed_docs"),
            ).collect()[0]
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "removed_tokens": agg["removed"],
                "scrubbed_docs": agg["scrubbed_docs"],
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
                        # the rename is a span bijection per copy: removal
                        # must be EXACTLY linear
                        "removed_exactly_linear": all(
                            r["removed_tokens"]
                            == a["removed_tokens"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
