#!/usr/bin/env python
"""IVF-PQ serving-path split at the 2M clustered point (judge r18
item 4): the r18 headline (recall@5 = 1.00 at 2M MoG vectors) bundled
fit + codes + search into one 148 s wall. The serving claim — build the
index ONCE, search per query batch against the cell-partitioned layout
reading only the probed directories — deserves its own numbers:

  build_wall     — ivfpq_index_build: coarse fit (distributed past 800
                   cells) + residual codebooks + one code-assignment
                   pass + partitionBy(cell) write of the inverted lists
  search_walls   — ann_ivfpq_search per harness query batch (N_QUERIES
                   queries), repeated; the plan reads the pruned scan
  partitions_read / n_files — the scan node's own metrics (number of
                   partitions / files read) on the executed search plan,
                   expected = |probed-cell union| << n_cells

Fixture: the same mixture-of-Gaussians recipe as
scaling_ivfpq_clustered.py (K_TRUE=64 centers, sigma 0.25, dim 64 —
Jégou et al. 2011 §V / FAISS-wiki-style structured data), multiplier
1000 = 2M vectors. HHA_SCALE_HEAP=16g recommended at that point.

Usage: python scripts/scaling_ivfpq_serving.py [multipliers...]
       default 1000; smaller values smoke-test the harness.
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

from scaling_ivfpq_clustered import BASE_N, build_clustered_embeddings


def _scan_partition_metrics(df) -> dict:
    """Leaf-scan metrics of an EXECUTED plan: number of partitions and
    files read (the observable form of 'the search touched only the
    probed directories'). Run the probe with AQE disabled (the
    test_layout pattern) — under AQE the executed plan's leaves are
    opaque QueryStage wrappers with no scan metrics."""
    out = {"partitions_read": 0, "files_read": 0}
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numPartitions"):
            out["partitions_read"] += m.apply("numPartitions").value()
        if m.contains("numFiles"):
            out["files_read"] += m.apply("numFiles").value()
    return out


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1000]

    from hadoop_hive_analysis_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from hadoop_hive_analysis_spark.operators.vectors import (
        ann_ivfpq_search,
        ivfpq_index_build,
    )
    from hadoop_hive_analysis_spark.session import (
        get_spark,
        release_cached_blocks,
    )

    heap = os.environ.get("HHA_SCALE_HEAP", "16g")
    spark = get_spark(
        "hha-scaling-ivfpq-serving",
        extra_conf={"spark.driver.memory": heap},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for m in multipliers:
        d = build_clustered_embeddings(m)
        idx = tempfile.mkdtemp(prefix=f"hha_ivfpq_idx_{m}x_")
        try:
            t0 = time.perf_counter()
            meta = ivfpq_index_build(spark, d, idx)
            build_wall = round(time.perf_counter() - t0, 2)
            release_cached_blocks(spark)

            search_walls = []
            n_rows = 0
            for _ in range(3):
                t0 = time.perf_counter()
                res = ann_ivfpq_search(spark, idx)
                rows = res.collect()
                search_walls.append(round(time.perf_counter() - t0, 2))
                n_rows = len(rows)
                release_cached_blocks(spark)
            assert n_rows == N_QUERIES * TOP_K, n_rows
            # untimed metrics probe, AQE off so the scan node is visible
            prev = spark.conf.get("spark.sql.adaptive.enabled")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                res = ann_ivfpq_search(spark, idx)
                res.collect()
                scan = _scan_partition_metrics(res)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", prev)
            release_cached_blocks(spark)

            row = {
                "multiplier": m,
                "vectors": BASE_N * m,
                "cells": len(meta["cells"]),
                "build_wall": build_wall,
                "search_walls": search_walls,
                "result_rows": n_rows,
                **scan,
            }
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(idx, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
