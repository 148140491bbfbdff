"""SparkSession factory with scale-oriented defaults.

The reference tuned Hadoop by hand (split sizing, combiner, uber mode,
reducer slow-start — ``Query 1a/TopKNetProfitDriver.java:207-239``,
``CS346 Report.pdf p.7-8``). The Spark equivalents are configuration, not
code: AQE re-plans shuffles at runtime (partition coalescing + skew-join
splitting), ``maxPartitionBytes`` replaces split sizing, and map-side
partial aggregation is always on in ``HashAggregateExec``.

All settings here hold on a real multi-executor cluster; ``local[N]`` is
only the test harness.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import SparkSession

# Storage level for corpus-scale localCheckpoint sites (shingle / token /
# span / posting / edge frames). SERIALIZED, not the default deserialized
# level: per-row on-heap objects thrash the GC during downstream sorts
# and — because localCheckpoint blocks are freed asynchronously by the
# ContextCleaner — ACCUMULATE across queries sharing one JVM. Measured
# twice: the r8 tfidf A/B (scripts/ab_tfidf_cosine.py — back-to-back
# deserialized runs degrade 15.3→8.7→18.1 s in one 8 GiB JVM; serialized
# levels them) and an r15 sf1 mini-pack A/B (6 dedup queries × 3 reps,
# one JVM, interleaved vs the prior tree: serialized 131 s total vs
# deserialized 158 s, worst first-rep outlier halved). Serialized blocks
# are flat buffers ~5× smaller; MEMORY_AND_DISK spills only under
# pressure. Deliberately-tiny checkpoints (1-row sketch rows, top-K+1
# frames) keep the default — there is nothing to win.
CKPT_LEVEL = StorageLevel.MEMORY_AND_DISK

# Defaults chosen for the 100 TB design point, not for the local test rig:
#  - AQE on: runtime partition coalescing, skew-join splitting, and
#    shuffle-to-broadcast demotion are the modern answer to every §4
#    hand-tuning in the reference.
#  - 128 MiB scan partitions: matches HDFS/S3 block sizing; at 100 TB this
#    yields ~800k scan tasks, which Spark handles; AQE coalesces the tail.
#  - shuffle partitions: a *starting* number; AQE's coalescePartitions
#    right-sizes each exchange, so overprovisioning is safe and advised.
#  - 64 MiB broadcast threshold: every dimension table in the workload
#    (store: 58 rows in the reference EDA; region/nation/supplier/part in
#    the test schema) is far below it, so star joins become BroadcastHash.
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: CAST returns NULL on malformed input, reproducing the
    # reference's drop-on-parse-failure semantics (SURVEY.md §2.2 P7/P8).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(
    app_name: str = "hadoop-hive-analysis-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's scale defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test rig;
    on a cluster, pass ``None`` and submit with ``--master yarn``/k8s —
    an explicitly-configured master in the environment wins.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(SCALE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
