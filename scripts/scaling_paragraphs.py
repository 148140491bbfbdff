#!/usr/bin/env python
"""Measured scale-up proof for paragraph-level dedup (SCALING.md).

The fixture corpus has no blank-line paragraphs, so this harness first
RESTRUCTURES the sf0.1 documents into paragraph form (token runs of ~20
joined with \\n\\n) and plants a constant-rate duplication signal: every
5th document gets a shared boilerplate paragraph appended (one
boilerplate identity per copy, so the dup RATE is constant as the
corpus grows by renamed copies — the same constant-dup-rate growth
discipline as scaling_minhash.py).

Both halves are timed: ``dedup_paragraphs`` (report) and
``paragraph_scrub`` (re-assembly). The work is one digest partial-agg +
join-back + per-doc rollup, so walls should track corpus size ~linearly
and the planted dup count should be exactly linear in the multiplier.

Usage: python scripts/scaling_paragraphs.py [multipliers...]
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

from scaling_minhash import (  # noqa: E402
    BASE_SF_DIR,
    ID_OFFSET,
    cpu_seconds,
    peak_mem_mb,
)

PARA_TOKENS = 20
BOILER_EVERY = 5


def build_paragraph_corpus(spark, multiplier: int) -> str:
    """documents.parquet with paragraph structure + planted boilerplate,
    grown by renamed copies (intra-copy dups preserved, cross-copy
    overlap zero)."""
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    base = load_table(spark, BASE_SF_DIR, "documents").select("doc_id", "text")
    # restructure: break the token stream into PARA_TOKENS-token
    # paragraphs joined by blank lines (pure codegen)
    paras = F.expr(
        f"transform(sequence(0, (size(split(text, '\\\\s+')) - 1) DIV {PARA_TOKENS}),"
        f" p -> array_join(slice(split(text, '\\\\s+'), p * {PARA_TOKENS} + 1,"
        f" {PARA_TOKENS}), ' '))"
    )
    structured = base.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text")
    )
    parts = []
    for k in range(multiplier):
        boiler = f"shared boilerplate paragraph for copy {k} end"
        renamed = structured.select(
            (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1_{k}").alias("text"),
        )
        parts.append(
            renamed.select(
                "doc_id",
                F.when(
                    F.col("doc_id") % BOILER_EVERY == 0,
                    F.concat("text", F.lit("\n\n" + boiler)),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    d = tempfile.mkdtemp(prefix=f"hha_scale_paras_{multiplier}x_")
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.dedup import (
        dedup_paragraphs,
        paragraph_scrub,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-paragraphs", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_paragraph_corpus(spark, m)
        try:
            row = {"multiplier": m, "docs": 5000 * m}
            for label, op in (
                ("report", dedup_paragraphs),
                ("scrub", paragraph_scrub),
            ):
                samples = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    cpu0 = cpu_seconds(spark)
                    op(spark, d).write.format("noop").mode("overwrite").save()
                    samples.append(
                        {
                            "wall_sec": round(time.perf_counter() - t0, 3),
                            "cpu_sec": round(cpu_seconds(spark) - cpu0, 2),
                        }
                    )
                best = min(samples, key=lambda s: s["wall_sec"])
                row[f"{label}_wall_sec"] = best["wall_sec"]
                row[f"{label}_cpu_sec"] = best["cpu_sec"]
                row[f"{label}_samples"] = samples
            rep = dedup_paragraphs(spark, d)
            row["dup_para_instances"] = rep.agg(
                F.sum("n_dup_paras").cast("long")
            ).first()[0]
            row["docs_with_dups"] = rep.filter(F.col("n_dup_paras") > 0).count()
            row["peak_mem_mb"] = peak_mem_mb(spark)
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    if len(results) > 1:
        a, b = results[0], results[-1]
        mult = b["multiplier"] / a["multiplier"]
        print(
            json.dumps(
                {
                    "summary": {
                        "size_growth": mult,
                        "report_wall_growth": round(
                            b["report_wall_sec"] / a["report_wall_sec"], 2
                        ),
                        "scrub_wall_growth": round(
                            b["scrub_wall_sec"] / a["scrub_wall_sec"], 2
                        ),
                        "dup_growth": round(
                            b["dup_para_instances"] / a["dup_para_instances"], 2
                        ),
                        "dup_rate_constant": abs(
                            b["dup_para_instances"] / b["docs"]
                            - a["dup_para_instances"] / a["docs"]
                        )
                        < 0.01,
                    }
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
