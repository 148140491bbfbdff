"""Interleaved A/B decomposition of doc_fingerprint at sf0.1.

The bench flagger has flagged doc_fingerprint two rounds running
(0.95 s r4 -> 1.51 s r5 -> ~1.15 s r6) with no code change since r4.
This script times the query's components interleaved, n rounds each, to
localize any real movement:

  full     — the committed query (base projection + min-shingle join)
  base     — md5 + content_h60 + rolling_h31 projection only
  no_roll  — base WITHOUT the rolling hash (isolates the split('')
             per-codepoint fold, the suspected-hot component)
  mins     — the shingle -> groupBy(min) side only

Usage: python scripts/ab_fingerprint.py [n_rounds]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.functions.hashing import h31, h64
from hadoop_hive_analysis_spark.functions.text import with_shingles
from hadoop_hive_analysis_spark.operators.text_analysis import (
    _ROLLING_HASH,
    doc_fingerprint,
)
from hadoop_hive_analysis_spark.session import get_spark
from hadoop_hive_analysis_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-fingerprint")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")

    def base(_s, _d):
        return d.select(
            "doc_id",
            F.md5("text").alias("md5_hex"),
            h64("text").alias("content_h60"),
            F.expr(_ROLLING_HASH).alias("rolling_h31"),
        )

    def no_roll(_s, _d):
        return d.select(
            "doc_id",
            F.md5("text").alias("md5_hex"),
            h64("text").alias("content_h60"),
        )

    def mins(_s, _d):
        return (
            with_shingles(d.select("doc_id", "text"), "text", 3)
            .groupBy("doc_id")
            .agg(F.min(h31(F.col("shingle"))).alias("min_shingle_hash"))
        )

    forms = {
        "full": doc_fingerprint,
        "base": base,
        "no_roll": no_roll,
        "mins": mins,
    }
    # warm-up
    doc_fingerprint(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    results: dict[str, list[float]] = {k: [] for k in forms}
    for r in range(rounds):
        for name, fn in forms.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:8s} median={med:.3f}s runs={ts}")


if __name__ == "__main__":
    main()
