#!/usr/bin/env python
"""Measured scale-up proof for ``text_analysis.doc_bigram_lm_score``
(SCALING.md).

Constant-statistics corpus growth (``scaling_minhash.build_scaled_corpus``):
each copy renames every token with a per-copy suffix — a bijection on
tokens AND on bigrams, so within-copy bigram counts c12 and left counts
c1 are reproduced exactly per copy with zero cross-copy overlap. Every
document's exact ppm score therefore repeats per copy: doc rows and the
corpus-wide sum of ``sum_cond_ppm`` must both be EXACTLY linear in the
multiplier, and the wall curve should be ~linear (explode once + two
count shuffles + key-colocated join-backs).

Usage: python scripts/scaling_bigram_lm.py [multipliers...]
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

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_bigram_lm_score,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-bigram-lm", extra_conf={"spark.driver.memory": "8g"}
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
                cpu0 = cpu_seconds(spark)
                df = doc_bigram_lm_score(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            agg = df.agg(
                F.count("*").alias("docs"),
                F.sum("sum_cond_ppm").alias("total_ppm"),
            ).first()
            row = {
                "multiplier": m,
                "docs": int(agg["docs"]),
                "total_ppm": int(agg["total_ppm"]),
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
                        # bigram rename is a bijection: per-copy scores
                        # repeat exactly
                        "docs_exactly_linear": all(
                            r["docs"] == a["docs"] * r["multiplier"]
                            for r in results
                        ),
                        "ppm_exactly_linear": all(
                            r["total_ppm"] == a["total_ppm"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
