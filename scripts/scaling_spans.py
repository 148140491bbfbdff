#!/usr/bin/env python
"""Measured scale-up proof for ``dedup.duplicated_spans`` (SCALING.md).

Same constant-dup-rate corpus growth as ``scaling_minhash.py`` (renamed
copies of the sf0.1 documents table: intra-copy span duplication is
preserved exactly, cross-copy span overlap is zero), timing the
stride-1 exact-substring profile at each size. The operator's work is
one span explode + one shuffle on span_h + the doc rollup, so the wall
curve should be ~linear in corpus size — the measured form of the
"sub-quadratic throughout" claim in its docstring.

Usage: python scripts/scaling_spans.py [multipliers...]
Prints one JSON line per scale plus a summary line.
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

    from hadoop_hive_analysis_spark.operators.dedup import duplicated_spans
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-scaling-spans", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            best, dup_docs = float("inf"), None
            for _ in range(2):
                t0 = time.perf_counter()
                cpu0 = cpu_seconds(spark)
                df = duplicated_spans(spark, d)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                cpu = cpu_seconds(spark) - cpu0
                if dup_docs is None:
                    dup_docs = df.filter(F.col("n_dup_spans") > 0).count()
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "dup_docs": dup_docs,
                "wall_sec": round(best, 3),
                "cpu_sec": round(cpu, 2),
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
                        "dup_docs_ratio": round(
                            b["dup_docs"] / max(a["dup_docs"], 1), 2
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
