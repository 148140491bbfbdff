#!/usr/bin/env python
"""Measured scale-up proof for ``dedup_minhash_lsh`` (SCALING.md §Dedup).

Builds corpora at 1×, 2×, 5×, 10× the sf0.1 documents table (5k → 50k
docs) and times the registered MinHash-LSH near-dup operator at each
size. Corpus construction replicates the base corpus with a PER-COPY
VOCABULARY RENAME (every word gets a ``_k`` suffix): a bijection on
shingles, so each copy's internal near-dup structure is preserved
EXACTLY (the k-th copy yields exactly the base corpus's dup pairs,
shifted), while cross-copy shingle overlap is zero. The workload —
docs, shingles, true dup pairs — therefore grows exactly linearly,
like a real corpus growing with constant dup-rate.

A sub-quadratic (≈linear) wall-clock curve here is the measured form of
the claim SCALING.md makes analytically: LSH work = O(corpus × bands) +
O(candidates), with candidates ∝ true dup pairs.

Usage: python scripts/scaling_minhash.py [multipliers...]
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

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_OFFSET = 10_000_000  # > any fixture doc_id; keeps copies disjoint


def build_scaled_corpus(spark, multiplier: int) -> str:
    """Write a ``documents.parquet`` with ``multiplier`` renamed copies of
    the base corpus into a temp sf_dir; return the dir."""
    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.sources.catalog import load_table

    base = load_table(spark, BASE_SF_DIR, "documents")
    parts = []
    for k in range(multiplier):
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
    d = tempfile.mkdtemp(prefix=f"hha_scale_{multiplier}x_")
    union.repartition(max(8, 4 * multiplier)).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def cpu_seconds(spark) -> float:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages", timeout=10
    ) as r:
        stages = json.loads(r.read())
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


def peak_mem_mb(spark) -> float:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/executors", timeout=10
    ) as r:
        execs = json.loads(r.read())
    peak = 0
    for ex in execs:
        pm = ex.get("peakMemoryMetrics") or {}
        peak = max(peak, pm.get("JVMHeapMemory", 0) + pm.get("JVMOffHeapMemory", 0))
    return round(peak / 1e6, 1)


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]

    from hadoop_hive_analysis_spark.operators.dedup import dedup_minhash_lsh
    from hadoop_hive_analysis_spark.session import get_spark

    # The default 1 GB local-mode JVM (driver + all executor threads in
    # one heap) is the test rig's constraint, not the design point — the
    # target node has 128 GiB. 8 GiB keeps 64 MiB-threshold broadcast
    # builds comfortable at 10x corpus size.
    heap = os.environ.get("HHA_SCALE_HEAP", "8g")
    spark = get_spark("hha-scaling", extra_conf={"spark.driver.memory": heap})
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
                df = dedup_minhash_lsh(spark, d)
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

    base = results[0]
    summary = {
        "metric": "minhash_lsh_scaling",
        "wall_ratio_at_max": round(results[-1]["wall_sec"] / base["wall_sec"], 2),
        "size_ratio_at_max": results[-1]["multiplier"] / base["multiplier"],
        # MinHash banding is hash-dependent, so the renamed copies see
        # slightly different candidate sets — allow 1% estimate noise.
        # Scale relative to the BASE run's multiplier, not absolute 1,
        # so partial invocations (e.g. `5 10`) check the right ratio.
        "pairs_linear": all(
            abs(
                r["pairs"]
                - base["pairs"] * r["multiplier"] / base["multiplier"]
            )
            <= max(2, 0.01 * base["pairs"] * r["multiplier"] / base["multiplier"])
            for r in results
        ),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
