#!/usr/bin/env python
"""Measured scale-up proof for ``sketches.doc_heavy_hitters`` and
``retrieval.doc_bm25_search`` (SCALING.md).

Corpus growth by REPLICATION (no token rename, unlike the dedup curves):
replication preserves every token's corpus SHARE, so the heavy-hitter
set must be IDENTICAL at every multiplier with counts EXACTLY
multiplier x base — the invariant that pins correctness while the wall
curve is measured. For BM25 the same corpus keeps per-doc tf/dl and
scales df/N/S uniformly, so the result stays a full 30-row top-K; its
wall should track the heavy-hitters curve (both are one tokenize pass +
candidate-bounded aggregation).

Usage: python scripts/scaling_heavy_hitters.py [multipliers...]
Prints one JSON line per scale plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_minhash import BASE_SF_DIR, ID_OFFSET, cpu_seconds, peak_mem_mb  # noqa: E402


def build_replicated_corpus(spark, multiplier: int) -> str:
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    base = load_table(spark, BASE_SF_DIR, "documents")
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
            *[c for c in base.columns if c != "doc_id"],
        )
        for k in range(multiplier)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    d = tempfile.mkdtemp(prefix=f"hha_scale_hh_{multiplier}x_")
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def timed(fn, spark, d):
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
    return df, min(samples, key=lambda s: s["wall_sec"]), samples


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    from hadoop_hive_analysis_spark.operators.retrieval import doc_bm25_search
    from hadoop_hive_analysis_spark.operators.sketches import doc_heavy_hitters
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-hh", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_hh: dict | None = None
    results = []
    for m in multipliers:
        d = build_replicated_corpus(spark, m)
        try:
            hh_df, hh_best, hh_samples = timed(doc_heavy_hitters, spark, d)
            hh = {r.tok: r.cnt for r in hh_df.collect()}
            if base_hh is None:
                base_hh = {t: c / m for t, c in hh.items()}
            assert set(hh) == set(base_hh), "heavy-hitter set changed"
            assert all(
                hh[t] == base_hh[t] * m for t in hh
            ), "counts not exactly multiplier x base"
            bm_df, bm_best, bm_samples = timed(doc_bm25_search, spark, d)
            n_bm = bm_df.count()
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "hh_tokens": len(hh),
                "hh_wall_sec": hh_best["wall_sec"],
                "hh_cpu_sec": hh_best["cpu_sec"],
                "hh_samples": hh_samples,
                "bm25_rows": n_bm,
                "bm25_wall_sec": bm_best["wall_sec"],
                "bm25_cpu_sec": bm_best["cpu_sec"],
                "bm25_samples": bm_samples,
                "peak_mem_mb": peak_mem_mb(spark),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        lo, hi = results[0], results[-1]
        ratio = hi["multiplier"] / lo["multiplier"]
        print(
            json.dumps(
                {
                    "summary": "heavy_hitters+bm25",
                    "data_ratio": ratio,
                    "hh_wall_ratio": round(
                        hi["hh_wall_sec"] / lo["hh_wall_sec"], 2
                    ),
                    "bm25_wall_ratio": round(
                        hi["bm25_wall_sec"] / lo["bm25_wall_sec"], 2
                    ),
                    "hh_set_stable": True,
                    "counts_exactly_linear": True,
                }
            )
        )


if __name__ == "__main__":
    main()
