#!/usr/bin/env python
"""Measured scale-up proof for ``text_analysis.doc_tfidf_cosine_pairs``
(SCALING.md).

Same constant-dup-rate corpus growth as ``scaling_minhash.py``: each
copy's vocabulary rename is a bijection on shingles, so within-copy
shingle dfs — and therefore the idf weights ``SCALE DIV df``, the exact
int64 dots/norms, and the surviving pair set — are reproduced exactly
per copy, with zero cross-copy shingle overlap. The reported pair count
must be EXACTLY multiplier x base_pairs; the wall curve should be
~linear (posting-list self-join with every list df-capped: O(corpus x
cap), never quadratic in a hot shingle).

Usage: python scripts/scaling_tfidf_cosine.py [multipliers...]
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

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        doc_tfidf_cosine_pairs,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-tfidf-cosine", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            # Per-run (wall, cpu) samples — the reported pair describes the
            # best-wall run; the pair count runs after both timed runs.
            samples = []
            df = None
            for _ in range(2):
                t0 = time.perf_counter()
                cpu0 = cpu_seconds(spark)
                df = doc_tfidf_cosine_pairs(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            pairs = df.count()
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "pairs": pairs,
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
                        # weights depend only on within-copy dfs (shingle
                        # rename is a bijection): pairs must be EXACTLY
                        # linear (relative to the base run's multiplier,
                        # so partial invocations check the right ratio)
                        "pairs_exactly_linear": all(
                            r["pairs"] * a["multiplier"]
                            == a["pairs"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
