#!/usr/bin/env python
"""Measured scale-up proof for ``ann_ivfpq_topk`` (SCALING.md): recall
vs the exact brute-force baseline and wall clock at growing corpus
multipliers of the sf0.1 embeddings table (sign-flip copies — the sf1
sweep's construction: within-copy geometry bit-exact, cross-copy
cosines at chance, so the true-neighbor structure is preserved while
the corpus grows).

This is the harness behind the SCALING.md isotropic IVF-PQ rows.
r17 (raw-vector codes, flat 100-row shortlist, probe 4): 0.98 / 0.90 /
0.84 / 0.74 recall@5 at 1x / 10x / 50x / 250x with the adaptive cell
count (16 / 16 / 80 / 400 cells) — plus the nprobe-∝-cells negative
result (recall unchanged, +34% wall at 250x). r18 (by-residual codes,
occupancy-proportional shortlist, sqrt-scaled probe): **1.0 / 1.0 /
0.98 / 0.98** — the r17 "isotropic decay law" was shortlist coverage,
closed without corpus-proportional rerank cost (see the SCALING.md
round-18 clustered block for the measurements that drove each change).

Usage: python scripts/scaling_ivfpq.py [multipliers...]   # default 1 10 50
(250 adds ~5 min and needs ~16g heap: HHA_SCALE_HEAP=16g)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_lsh_cc import build_scaled_embeddings  # noqa: E402


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 10, 50]

    from hadoop_hive_analysis_spark.operators.similarity import (
        ann_bruteforce_topk,
    )
    from hadoop_hive_analysis_spark.operators.vectors import (
        _ivfpq_cells,
        ann_ivfpq_topk,
    )
    from hadoop_hive_analysis_spark.session import (
        get_spark,
        release_cached_blocks,
    )

    heap = os.environ.get("HHA_SCALE_HEAP", "12g")
    spark = get_spark(
        "hha-scaling-ivfpq", extra_conf={"spark.driver.memory": heap}
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for m in multipliers:
        d = build_scaled_embeddings(m)
        try:
            t0 = time.perf_counter()
            approx = {
                (r.query_id, r.neighbor_id)
                for r in ann_ivfpq_topk(spark, d).collect()
            }
            wall = round(time.perf_counter() - t0, 2)
            release_cached_blocks(spark)
            t1 = time.perf_counter()
            exact = {
                (r.query_id, r.neighbor_id)
                for r in ann_bruteforce_topk(spark, d).collect()
            }
            bf_wall = round(time.perf_counter() - t1, 2)
            release_cached_blocks(spark)
            row = {
                "multiplier": m,
                "vectors": 2000 * m,
                "cells": _ivfpq_cells(2000 * m),
                "recall": round(len(exact & approx) / len(exact), 3),
                "ivfpq_wall": wall,
                "bruteforce_wall": bf_wall,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "ivfpq_scaling",
                "recall_curve": [
                    (r["multiplier"], r["recall"]) for r in results
                ],
                "floor": "7/10",
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
