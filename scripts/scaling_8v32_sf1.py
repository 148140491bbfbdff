#!/usr/bin/env python
"""8-core vs 32-core scaling probe at sf1 (judge r19 item 3).

The sf0.1 bench's 8v32 ratios are all ~1 because every query sits at the
per-query scheduling floor (single-row-group fixtures, sub-second
walls) — the probe carries no signal there. This script re-runs it at
10× (the "sf1" sweep scale the r19 dedup carriers already used): build a
combined scaled sf_dir ONCE, then time the top-wall queries in a fresh
JVM per core count so the ratio reflects real parallelism, not shared
JVM state.

Usage:
  python scripts/scaling_8v32_sf1.py build            # prints the dir
  SPARK_GRAFT_CPUS=8  python scripts/scaling_8v32_sf1.py run <dir> 8
  SPARK_GRAFT_CPUS=32 python scripts/scaling_8v32_sf1.py run <dir> 32

Each `run` appends one JSON line per query to SCALING_8V32.jsonl in the
repo root (query, cpus, best wall of 2, cpu seconds), and prints them.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

MULTIPLIER = 10

QUERIES_TO_PROBE = [
    "doc_tfidf_cosine_pairs",
    "dedup_collapse",
    "span_scrub",
    "duplicated_spans",
    "dedup_cluster_quality",
    "dedup_family_profile",
    "corpus_clean",
    "dedup_embedding_lsh",
    "ann_ivfpq_recall",
    "doc_hybrid_search_rrf",
    "eda_sketch_profile",
    "events_stream_join_replay",
]

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build() -> str:
    """Combined 10x sf_dir: scaled documents/embeddings/lineitem/events,
    every other fixture table symlinked from the base."""
    import tempfile

    from scaling_cohort import build_scaled_events
    from scaling_flagships import build_scaled_lineitem
    from scaling_lsh_cc import build_scaled_embeddings
    from scaling_minhash import build_scaled_corpus

    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark("scaling-8v32-build")
    spark.sparkContext.setLogLevel("ERROR")

    out = tempfile.mkdtemp(prefix=f"hha_8v32_{MULTIPLIER}x_")
    scaled = {
        "documents.parquet": build_scaled_corpus(spark, MULTIPLIER),
        "embeddings.parquet": build_scaled_embeddings(MULTIPLIER),
        "lineitem.parquet": build_scaled_lineitem(spark, MULTIPLIER),
    }
    for name, d in scaled.items():
        os.symlink(os.path.join(d, name), os.path.join(out, name))
    # events must land as ONE ts-ordered FILE, matching the fixture
    # layout the inner-join replay assumes: a Spark-written multi-part
    # directory drains in file order, advances the watermark past
    # not-yet-read rows and silently drops them as late (the left-join
    # replay documents the same hazard and stages around it) — measured
    # here as 0 stream rows vs 1830 batch rows at 10×.
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev_dir = build_scaled_events(spark, MULTIPLIER)
    pdf = (
        spark.read.parquet(os.path.join(ev_dir, "events.parquet"))
        .orderBy("ts")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(out, "events.parquet"),
    )
    for f in os.listdir(BASE_SF_DIR):
        if f.endswith(".parquet") and not os.path.exists(os.path.join(out, f)):
            os.symlink(
                os.path.join(BASE_SF_DIR, f), os.path.join(out, f)
            )
    spark.stop()
    print(out)
    return out


def run(sf_dir: str, cpus_tag: str) -> None:
    from hadoop_hive_analysis_spark.plans.registry import QUERIES
    from hadoop_hive_analysis_spark.session import get_spark, release_cached_blocks

    spark = get_spark(
        f"scaling-8v32-c{cpus_tag}", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    assert str(sc.defaultParallelism) == cpus_tag, (
        sc.defaultParallelism,
        cpus_tag,
    )

    import urllib.request

    def cpu_seconds() -> float:
        base, app = sc.uiWebUrl, sc.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            return sum(s.get("executorCpuTime", 0) for s in json.loads(r.read())) / 1e9

    out_path = os.path.join(os.path.dirname(HERE), "SCALING_8V32.jsonl")
    for name in QUERIES_TO_PROBE:
        spec = QUERIES[name]
        walls, cpus_used = [], []
        for i in range(2):
            sc.setJobDescription(f"8v32 {name} c{cpus_tag} run{i}")
            c0 = cpu_seconds()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            cpus_used.append(round(cpu_seconds() - c0, 2))
            sc.setJobDescription(None)
            release_cached_blocks(spark)
        rec = {
            "query": name,
            "cpus": int(cpus_tag),
            "multiplier": MULTIPLIER,
            "walls": walls,
            "best": min(walls),
            "cpu_best_run": cpus_used[walls.index(min(walls))],
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[2], sys.argv[3])
