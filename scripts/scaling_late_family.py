#!/usr/bin/env python
"""Measured scale-up for the remaining late-r9 pipeline trio
(SCALING.md): ``corpus_budget_select``, ``text_encoding_screen``,
``seq_length_buckets``. The paragraph family, hybrid RRF, and the
cluster-quality audit already have curves; this closes the set.

Renamed-copy corpus growth (``scaling_minhash.build_scaled_corpus``).
Per-copy text statistics are identical up to the ``_k`` suffix, so:

- budget_select: the selected-token share must stay ≈ BUDGET_PPM of
  the corpus total at every scale (the threshold bin straddle makes it
  ≤ budget and > budget − one straddling doc), and membership must be
  deterministic across two runs;
- text_encoding_screen: exactly one row per document (scan-bound
  report), all-clean on the ASCII fixture at every scale;
- seq_length_buckets: ≤ |BUCKET_CEILINGS| rows regardless of corpus
  size, with total docs across buckets exactly equal to the corpus.

Usage: python scripts/scaling_late_family.py [multipliers...]
Prints one JSON line per (op, scale) plus a summary line per op.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_minhash import build_scaled_corpus, cpu_seconds  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.text_analysis import (
        text_encoding_screen,
    )
    from hadoop_hive_analysis_spark.operators.text_pipeline import (
        BUDGET_PPM,
        corpus_budget_select,
        seq_length_buckets,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    heap = os.environ.get("HHA_SCALE_HEAP", "8g")
    spark = get_spark(
        "hha-scaling-late-family", extra_conf={"spark.driver.memory": heap}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, list[dict]] = {}
    for m in multipliers:
        d = build_scaled_corpus(spark, m)
        try:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            n_docs = docs.count()

            for op, fn in (
                ("corpus_budget_select", corpus_budget_select),
                ("text_encoding_screen", text_encoding_screen),
                ("seq_length_buckets", seq_length_buckets),
            ):
                best, df = 9e9, None
                for _ in range(2):
                    t0 = time.perf_counter()
                    c0 = cpu_seconds(spark)
                    df = fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    wall = time.perf_counter() - t0
                    cpu = cpu_seconds(spark) - c0
                    if wall < best:
                        best, best_cpu = wall, cpu
                row = {
                    "op": op,
                    "multiplier": m,
                    "docs": n_docs,
                    "wall_sec": round(best, 3),
                    "cpu_sec": round(best_cpu, 2),
                }
                if op == "corpus_budget_select":
                    sel = df
                    agg = sel.agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.sum("n_tokens").alias("sel_tokens"),
                    ).first()
                    # recompute the corpus token total independently
                    from hadoop_hive_analysis_spark.operators.text_analysis import (
                        text_quality_score,
                    )

                    tot = (
                        text_quality_score(spark, d)
                        .filter(F.col("quality").isNotNull())
                        .agg(F.sum("n_tokens"))
                        .first()[0]
                    )
                    budget = tot * BUDGET_PPM // 1_000_000
                    sel2 = {
                        tuple(r)
                        for r in fn(spark, d).select("doc_id").collect()
                    }
                    sel1 = {
                        tuple(r) for r in sel.select("doc_id").collect()
                    }
                    row.update(
                        selected_docs=agg["rows"],
                        selected_tokens=int(agg["sel_tokens"]),
                        budget=int(budget),
                        fits_budget=bool(agg["sel_tokens"] <= budget),
                        share_ppm=int(agg["sel_tokens"] * 1_000_000 // tot),
                        deterministic=sel1 == sel2,
                    )
                elif op == "text_encoding_screen":
                    n_rows = df.count()
                    n_clean = df.filter(F.col("clean")).count()
                    row.update(
                        rows=n_rows,
                        one_row_per_doc=bool(n_rows == n_docs),
                        all_clean=bool(n_clean == n_rows),
                    )
                else:
                    rows = df.collect()
                    row.update(
                        buckets=len(rows),
                        docs_covered=int(
                            sum(r["n_docs"] for r in rows)
                        ),
                        covers_corpus=bool(
                            sum(r["n_docs"] for r in rows) == n_docs
                        ),
                    )
                results.setdefault(op, []).append(row)
                print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for op, rows in results.items():
        if len(rows) > 1:
            a, b = rows[0], rows[-1]
            print(
                json.dumps(
                    {
                        "summary": {
                            "metric": f"{op}_scaling",
                            "data_ratio": b["multiplier"] / a["multiplier"],
                            "wall_ratio": round(
                                b["wall_sec"] / a["wall_sec"], 2
                            ),
                        }
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
