"""Data-layout maintenance: small-file compaction and range-clustered
writes — the two table-maintenance jobs a 100 TB deployment schedules
alongside the streaming ETL sink.

* **Compaction**: `foreachBatch` ingestion (``streaming/events.py``)
  lands one file set per micro-batch; a day's partition accumulates
  hundreds of small files, and scan cost at 100 TB is dominated by
  file-open/footer overhead long before bytes. :func:`compact_parquet_dir`
  rewrites a directory to ~target-sized files with an atomic publish.

* **Range clustering**: parquet readers skip whole ROW GROUPS whose
  column min/max excludes a pushed predicate — but only if the writer
  put correlated values together. :func:`write_range_clustered`
  repartitions by range and sorts within partitions, so each row group
  covers a narrow slice of the clustering key and a selective filter
  reads ~(selectivity) of the table instead of every row group. This is
  the open-source form of Z-ordering for single-key locality (true
  multi-key Z-curves need an interleaved-bits sort key — the hook is the
  same ``sort_cols`` parameter).

Both effects are MEASURED in ``tests/test_layout.py`` via the scan
node's ``numOutputRows`` metric (rows surviving row-group pruning), not
just asserted by intent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Returns the resulting file count. Sizing: actual on-disk bytes /
    target, so compression ratio is accounted for by construction.

    Pass ``sort_cols`` when compacting a range-clustered directory
    (:func:`write_range_clustered`): the rewrite then re-ranges and
    re-sorts on the same keys, so row-group min/max locality — and the
    pruning it buys — survives compaction. Without it, the plain
    ``repartition`` scatters the clustering. Either way the write pins
    stats-bearing ``TIMESTAMP_MICROS`` (Spark's default INT96 carries no
    column statistics, which would silently disable timestamp row-group
    pruning on the compacted copy).

    Publish discipline, stated honestly: the fully-built copy is staged
    as a sibling, then swapped in with two renames. POSIX cannot
    atomically exchange two non-empty directories, so there is a
    microseconds-wide window where ``path`` does not exist and a
    concurrent reader would get a FileNotFound — run compaction in the
    table's maintenance window, against CLOSED partitions only (the
    streaming sink's ``batch_id=``/``day=`` partitions, never the live
    one), exactly as any non-transactional table format requires. A
    leftover ``<path>.old`` from a previously crashed run is removed
    before the swap (a rename onto a non-empty directory would fail).
    """
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(path)
    build = tempfile.mkdtemp(
        prefix="hha_compact_", dir=os.path.dirname(os.path.abspath(path))
    )
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        part = (
            df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
            if sort_cols
            else df.repartition(n_files)
        )
        part.write.mode("overwrite").parquet(build)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)  # crashed-run leftover
    os.rename(path, old)
    os.rename(build, path)
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for _, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int,
    **writer_options: str,
) -> None:
    """Write ``df`` range-partitioned + sorted on ``sort_cols``: every
    output file (and therefore every row group) covers a narrow,
    non-overlapping slice of the key space, which is exactly what the
    parquet reader's min/max row-group pruning needs to make a selective
    pushed filter cheap.

    Timestamp gotcha, learned the measured way: Spark's default parquet
    timestamp encoding is INT96, which carries NO column statistics — a
    time-clustered layout written that way prunes NOTHING. The write
    pins ``outputTimestampType=TIMESTAMP_MICROS`` (stats-bearing) for
    its duration. ``writer_options`` pass through to the parquet writer
    (e.g. ``**{"parquet.block.size": "65536"}`` to shrink row groups).
    """
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        w = (
            df.repartitionByRange(n_files, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
        )
        for k, v in writer_options.items():
            w = w.option(k, v)
        w.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
