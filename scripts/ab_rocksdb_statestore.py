#!/usr/bin/env python
"""Interleaved A/B: HDFS-backed vs RocksDB state-store provider on the
stream-stream join replay (judge r19 item 4, guide §5).

The r19 progress breakdown showed `events_stream_join_replay`'s wall is
streaming fixed cost: batch 0 trigger ~3.3 s + an EMPTY watermark-advance
batch ~1.1 s that re-reads/re-commits 8 state partitions over zero rows.
Hypothesis under test: RocksDB + changelog checkpointing makes the empty
batch's commit cheaper than the HDFS-backed provider's full-snapshot
commit. Each replay call builds a fresh checkpoint, so the provider conf
can alternate per run within one JVM.

Usage: python scripts/ab_rocksdb_statestore.py [cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ROCKSDB = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_hive_analysis_spark.session import get_spark, release_cached_blocks
    from hadoop_hive_analysis_spark.streaming import events as sev

    spark = get_spark("ab-rocksdb-statestore")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (untimed): JIT + file index, default provider.
    sev.events_stream_join_replay(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_cached_blocks(spark)

    def run(tag: str, conf: dict[str, str]) -> tuple[float, int, list]:
        prev = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        sev.PROGRESS_SINK = []
        try:
            spark.sparkContext.setJobDescription(f"ssjoin replay [{tag}]")
            t0 = time.perf_counter()
            df = sev.events_stream_join_replay(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            n = df.count()
        finally:
            progress = sev.PROGRESS_SINK
            sev.PROGRESS_SINK = None
            spark.sparkContext.setJobDescription(None)
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        release_cached_blocks(spark)
        return wall, n, progress

    results: dict[str, list[float]] = {"hdfs": [], "rocksdb": []}
    rows: dict[str, int] = {}
    for c in range(cycles):
        for tag, conf in (("hdfs", {}), ("rocksdb", ROCKSDB)):
            wall, n, progress = run(tag, conf)
            results[tag].append(round(wall, 3))
            rows[tag] = n
            batches = [
                (
                    p.get("batchId"),
                    round((p.get("durationMs") or {}).get("triggerExecution", 0) / 1000, 3),
                    round((p.get("durationMs") or {}).get("addBatch", 0) / 1000, 3),
                )
                for p in progress
            ]
            print(
                f"cycle {c} {tag:8s} wall={wall:6.3f}s rows={n} "
                f"batches(id, trigger_s, addBatch_s)={batches}"
            )

    assert rows["hdfs"] == rows["rocksdb"], rows
    for tag, walls in results.items():
        print(
            f"{tag:8s} walls={walls} best={min(walls)} "
            f"median={sorted(walls)[len(walls) // 2]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
