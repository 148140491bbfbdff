#!/usr/bin/env python
"""Measured scale-up proof for ``retrieval.doc_bm25_search``
(SCALING.md) — promoted to a driver slot in round 8.

Corpus growth: the same renamed-copy protocol as the dedup curves
(``scaling_minhash.build_scaled_corpus``). The probe queries are fixed
English terms, so renamed copies (every token suffixed ``_k``) add
corpus WITHOUT adding matches: the posting join's broadcast probe-term
filter keeps the tf frame constant-size while the explode, dl, and
corpus totals scale linearly — exactly the 100 TB regime (a query
touches a vanishing fraction of the corpus; the corpus statistics
still have to be exact over all of it).

Output invariants checked:
- row count constant (qids x top-K among the constant match set);
- every returned doc_id is a copy-0 doc (renamed copies can't match);
- the (qid, doc_id, n_terms_matched) set is reported stable/unstable —
  scores legitimately CHANGE with N (idf grows with corpus size), so
  rank flips between docs matching different term subsets are
  possible in principle; the harness reports whether one occurred.

Usage: python scripts/scaling_bm25.py [multipliers...]
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

from scaling_minhash import BASE_SF_DIR, cpu_seconds, peak_mem_mb  # noqa: E402

ID_OFFSET = 1_000_000_000


def build_scaled_corpus_identity0(spark, multiplier: int) -> str:
    """Like ``scaling_minhash.build_scaled_corpus`` but copy 0 is the
    VERBATIM base corpus (that builder renames every copy, including
    copy 0 — fine for dedup invariants, but it would leave the fixed
    English probe queries matching nothing)."""
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    base = load_table(spark, BASE_SF_DIR, "documents")
    parts = [base]
    for k in range(1, multiplier):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1_{k}").alias("text"),
                *[c for c in base.columns if c not in ("doc_id", "text")],
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    d = tempfile.mkdtemp(prefix=f"hha_bm25scale_{multiplier}x_")
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from hadoop_hive_analysis_spark.operators.retrieval import doc_bm25_search
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("hha-scaling-bm25", extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_corpus_identity0(spark, m)
        try:
            samples = []
            df = None
            for _ in range(2):
                t0 = time.perf_counter()
                cpu0 = cpu_seconds(spark)
                df = doc_bm25_search(spark, d)
                df.write.format("noop").mode("overwrite").save()
                samples.append(
                    {
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                    }
                )
            best = min(samples, key=lambda s: s["wall_sec"])
            rows = [
                (r.qid, r.doc_id, r.n_terms_matched) for r in df.collect()
            ]
            row = {
                "multiplier": m,
                "docs": 5000 * m,
                "result_rows": len(rows),
                "all_copy0": all(doc < ID_OFFSET for _, doc, _ in rows),
                "wall_sec": best["wall_sec"],
                "cpu_sec": best["cpu_sec"],
                "samples": samples,
                "peak_mem_mb": peak_mem_mb(spark),
            }
            row["_set"] = sorted(rows)
            results.append(row)
            print(json.dumps({k: v for k, v in row.items() if k != "_set"}),
                  flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        a, b = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": {
                        "metric": "doc_bm25_search_scaling",
                        "data_ratio": b["multiplier"] / a["multiplier"],
                        "wall_ratio": round(b["wall_sec"] / a["wall_sec"], 2),
                        "rows_constant": all(
                            r["result_rows"] == a["result_rows"] for r in results
                        ),
                        "all_matches_from_copy0": all(
                            r["all_copy0"] for r in results
                        ),
                        "match_set_stable": all(
                            r["_set"] == a["_set"] for r in results
                        ),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
