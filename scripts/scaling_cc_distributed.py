#!/usr/bin/env python
"""Distributed connected-components at and past the small-graph cap
(SCALING.md): every corpus-derived curve now rides the union-find fast
path (near-dup pair sets stay well under 2^20 edges even at 500k docs),
so this harness is the direct evidence that the DISTRIBUTED
large-star/small-star path — the one a 100 TB corpus with billions of
near-dup pairs would take — converges in O(log n) rounds and agrees
with ground truth beyond the cap.

Graph: a seeded hash-random union of (a) ring edges over k-node
blocks (every block one component — known answer by construction) and
(b) cross-block chords inside a bounded window, so components have
nontrivial diameter and the star rounds do real contraction work.
Ground truth: driver-side union-find over the same edge list (exact),
compared on component COUNT and the full size histogram.

Usage: python scripts/scaling_cc_distributed.py [n_edges ...]
(defaults: 500_000 — under the cap; 4_000_000 — 4x past it)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BLOCK = 40  # nodes per planted component


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 4_000_000]

    from pyspark.sql import functions as F

    from hadoop_hive_analysis_spark.operators.components import (
        connected_components_bigstar,
    )
    from hadoop_hive_analysis_spark.session import get_spark

    spark = get_spark(
        "hha-scaling-cc", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n_edges in sizes:
        n_ring = n_edges * 2 // 3
        n_chord = n_edges - n_ring
        n_nodes = n_ring  # ring edge i connects consecutive nodes in a block
        ring = spark.range(n_ring).select(
            F.col("id").alias("u"),
            F.when(
                (F.col("id") % BLOCK) == BLOCK - 1,
                F.col("id") - (BLOCK - 1),  # close the ring
            )
            .otherwise(F.col("id") + 1)
            .alias("v"),
        )
        # chords: deterministic hash-pseudorandom pairs INSIDE a block so
        # the planted component structure (one per block) stays the truth
        chord = spark.range(n_chord).select(
            (
                F.pmod(F.xxhash64("id"), n_nodes // BLOCK).cast("long") * BLOCK
                + F.pmod(F.xxhash64("id", F.lit(1)), BLOCK)
            ).alias("u"),
            (
                F.pmod(F.xxhash64("id"), n_nodes // BLOCK).cast("long") * BLOCK
                + F.pmod(F.xxhash64("id", F.lit(2)), BLOCK)
            ).alias("v"),
        )
        edges = (
            ring.unionByName(chord)
            .filter(F.col("u") != F.col("v"))
            .localCheckpoint(eager=True)
        )
        m = edges.count()

        t0 = time.perf_counter()
        comp = connected_components_bigstar(
            edges, "u", "v", small_graph_cap=0
        )
        hist_dist = dict(
            comp.groupBy("component")
            .count()
            .groupBy("count")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        wall = round(time.perf_counter() - t0, 2)

        # ground truth: exact union-find on the driver
        t1 = time.perf_counter()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():
            a, b = find(r.u), find(r.v)
            if a != b:
                parent[max(a, b)] = min(a, b)
        from collections import Counter

        csize = Counter(find(x) for x in list(parent))
        hist_true = Counter(csize.values())
        uf_wall = round(time.perf_counter() - t1, 2)

        print(
            json.dumps(
                {
                    "edges": m,
                    "past_fast_path_cap": m > (1 << 20),
                    "components_distributed": int(
                        sum(hist_dist.values())
                    ),
                    "components_true": int(sum(hist_true.values())),
                    "size_histogram_match": {
                        int(k): int(v) for k, v in hist_dist.items()
                    }
                    == {int(k): int(v) for k, v in hist_true.items()},
                    "distributed_wall_sec": wall,
                    "driver_unionfind_wall_sec": uf_wall,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
