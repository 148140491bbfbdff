"""Interleaved A/B of dedup_ngram_jaccard plan forms at sf0.1.

Forms:
  anti    — committed form: hot-set anti-join cut, then posting-list
            self-join on shingle.
  plist   — df-cut anti-join, then ONE groupBy(shingle) collecting the
            (bounded, df<=32) posting list; pairs generated codegen-side
            from the array (<=496 per shingle) — no self-join at all.
  plist1  — single-aggregation variant: collect_list + count in one
            groupBy, df filter AFTER collection (1 shuffle of sh, but
            unbounded agg buffers on hot shingles — scale-unsafe control).

Usage: python scripts/ab_ngram.py [n_rounds]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    STOP_SHINGLE_DF,
    _doc_shingles,
    dedup_ngram_jaccard,
)
from hadoop_hive_analysis_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def _pairs_from_plist(spark, sf_dir, single_pass=False):
    sh = _doc_shingles(spark, sf_dir).localCheckpoint(eager=False)
    if single_pass:
        g = (
            sh.groupBy("shingle")
            .agg(F.collect_list("doc_id").alias("docs"), F.count("*").alias("df"))
            .filter(F.col("df") <= STOP_SHINGLE_DF)
        )
        kept = sh  # card still needs the cut; recompute via explode below
        card = (
            g.select(F.explode("docs").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"))
        )
    else:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > STOP_SHINGLE_DF)
            .select("shingle")
        )
        kept = sh.join(hot, "shingle", "left_anti")
        g = kept.groupBy("shingle").agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        card = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = g.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (a, i) -> "
                "transform(slice(docs, i + 2, size(docs)), b -> "
                "struct(least(a, b) as doc_a, greatest(a, b) as doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("ix"))
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", F.col("ix") / (F.col("na") + F.col("nb") - F.col("ix")))
        .filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    )
    return jac.select("doc_a", "doc_b", "jaccard")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark()
    forms = {
        "anti": lambda: dedup_ngram_jaccard(spark, SF_DIR),
        "plist": lambda: _pairs_from_plist(spark, SF_DIR, single_pass=False),
        "plist1": lambda: _pairs_from_plist(spark, SF_DIR, single_pass=True),
    }
    counts = {}
    times = {k: [] for k in forms}
    for r in range(rounds):
        for name, fn in forms.items():
            t0 = time.monotonic()
            n = fn().count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            counts.setdefault(name, n)
            print(f"round {r} {name}: {dt:.3f}s rows={n}", flush=True)
    print("counts:", counts)
    assert len(set(counts.values())) == 1, "FORMS DISAGREE ON ROW COUNT"
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: best={ts[0]:.3f} median={ts[len(ts)//2]:.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
