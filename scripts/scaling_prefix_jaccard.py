#!/usr/bin/env python
"""Measured comparison of the two Jaccard candidate generators
(SCALING.md): full posting-list self-join (``dedup_ngram_jaccard``) vs
PPJoin prefix filtering (``dedup_prefix_filter_jaccard``), on the same
constant-dup-rate renamed-copy corpora as every dedup curve.

Invariants asserted per scale: identical pair sets (the prefix theorem
— filtering must lose nothing), pairs exactly linear in the multiplier.
Reported: wall/cpu for both algorithms. The prefix variant pays two
extra frames (df join-back + per-doc ranking window) to cut the
candidate join's posting lists ~5x at t=0.8 — at fixture scale the
overhead can dominate; the report makes the crossover visible instead
of asserting a winner.

Usage: python scripts/scaling_prefix_jaccard.py [multipliers...]
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

    from hadoop_hive_analysis_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_prefix_filter_jaccard,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-prefix-jaccard", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            out = {"multiplier": m, "docs": 5000 * m}
            rows = {}
            for name, fn in [
                ("full", dedup_ngram_jaccard),
                ("prefix", dedup_prefix_filter_jaccard),
            ]:
                samples = []
                for _ in range(2):
                    t0, c0 = time.perf_counter(), cpu_seconds(spark)
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    samples.append(
                        {
                            "wall": round(time.perf_counter() - t0, 3),
                            "cpu": round(cpu_seconds(spark) - c0, 2),
                        }
                    )
                out[name] = min(samples, key=lambda x: x["wall"])
                rows[name] = sorted(
                    (r.doc_a, r.doc_b) for r in fn(spark, d).collect()
                )
            out["pairs"] = len(rows["full"])
            out["pair_sets_equal"] = rows["full"] == rows["prefix"]
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
                        "metric": "prefix_vs_full_jaccard_scaling",
                        "data_ratio": b["multiplier"] / a["multiplier"],
                        "full_wall_ratio": round(
                            b["full"]["wall"] / a["full"]["wall"], 2
                        ),
                        "prefix_wall_ratio": round(
                            b["prefix"]["wall"] / a["prefix"]["wall"], 2
                        ),
                        "all_pair_sets_equal": all(
                            r["pair_sets_equal"] for r in results
                        ),
                        "pairs_exactly_linear": all(
                            r["pairs"] == a["pairs"] * r["multiplier"]
                            for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
