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


# ----------------------------------------------------- Z-order clustering

ZORDER_BITS = 16  # per-dimension resolution of the Z-curve


def zorder_key(df: DataFrame, cols: list[str]):
    """Interleaved-bits Z-curve key over ``cols`` (2+ dimensions).
    Returns ``(bounds_df, key_col)``: cross-join the broadcast 1-row
    ``bounds_df`` and the key column is valid.

    Each column is min/max-normalized to ``ZORDER_BITS`` bits with exact
    int64 arithmetic, then the bit planes are interleaved — all
    `pyspark.sql.functions` bit ops, so the key is whole-stage-codegen
    JVM work, no UDF and no driver-side collect (the bounds stay a
    broadcast 1-row aggregate). Min/max scaling keeps rank locality for
    roughly uniform keys (the production refinement for skew is
    range-bucket ranks — same interleave, different normalizer).

    Sorting by this key gives every file/row group a narrow range in
    EVERY clustering dimension simultaneously — the multi-key layout
    :func:`write_range_clustered`'s lexicographic sort cannot give
    (its second key prunes nothing once the first key dominates the
    sort order).
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("long")).alias(f"__zmin_{c}"),
            F.max(F.col(c).cast("long")).alias(f"__zmax_{c}"),
        ]
    bounds = df.agg(*aggs)
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__zmin_{c}"), F.col(f"__zmax_{c}")
        span = F.greatest(hi - lo, F.lit(1))
        scaled.append(
            (
                (F.col(c).cast("long") - lo)
                * F.lit((1 << ZORDER_BITS) - 1)
                / span
            ).cast("long")
        )
    key = F.lit(0).cast("long")
    for bit in range(ZORDER_BITS):
        for dim, s in enumerate(scaled):
            plane = F.shiftright(s, bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(plane, bit * len(scaled) + dim)
            )
    return F.broadcast(bounds), key


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    **writer_options: str,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols``: range-partition +
    sort on the interleaved-bits key, then DROP the key before writing —
    what matters on disk is that each row group's min/max on the
    ORIGINAL columns is narrow in every dimension, which is what the
    Z-curve sort produces and what parquet row-group pruning consumes.
    Same stats-bearing timestamp pinning as :func:`write_range_clustered`.
    """
    spark = df.sparkSession
    bounds, key = zorder_key(df, cols)
    keyed = df.crossJoin(bounds).withColumn("__zkey", key)
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        w = (
            keyed.repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey", *[c for c in keyed.columns if c.startswith("__zmin") or c.startswith("__zmax")])
            .write.mode("overwrite")
        )
        for k, v in writer_options.items():
            w = w.option(k, v)
        w.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    n_files: int,
    expected_ndv: int = 1_000_000,
    **writer_options: str,
) -> None:
    """Write ``df`` with parquet BLOOM FILTERS on ``bloom_cols`` — the
    layout lever for POINT lookups that range/Z-order clustering cannot
    serve: min/max row-group stats prune range predicates, but an
    equality probe on a high-cardinality unclustered key (a digest, an
    event_id) falls inside every group's min/max and scans everything.
    A bloom filter answers "definitely absent" per row group, so
    NEGATIVE lookups — the dominant case in ingest-time existence
    checks ("is this content digest already in the corpus?", the
    streaming-dedup snapshot probe) — skip every group. Measured in
    ``tests/test_layout.py``: an absent-key equality probe scans ALL
    rows without the filter and ZERO rows with it.

    At 100 TB: blooms cost ~1.2 bytes/ndv per group (expected_ndv
    bounds the false-positive rate), read only when an eq predicate
    names the column, and compose with clustering — range-cluster the
    time dimension, bloom the identity dimension.
    """
    w = df.repartition(n_files).write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv))
    for k, v in writer_options.items():
        w = w.option(k, v)
    w.parquet(path)


def erase_rows(
    spark: SparkSession,
    path: str,
    keys: list,
    key_col: str = "user_id",
) -> dict:
    """Right-to-be-forgotten rewrite: republish the parquet directory at
    ``path`` minus every row whose ``key_col`` is in ``keys``, and
    return an audit dict {rows_before, rows_erased, rows_after,
    n_files} — the record a deletion request needs for compliance.

    The erase set is a broadcast LEFT ANTI join (deletion requests are
    small by construction — thousands of subjects against billions of
    rows), so the table is scanned once; the single shuffle is the
    round-robin ``repartition`` that restores the original file count
    for the republish (intra-file ordering and any prior sort layout
    are NOT preserved — re-run :func:`write_clustered_parquet` after a
    GDPR pass if the table is range-clustered). An empty ``keys`` list
    short-circuits to a zero-erasure audit without touching the files.
    Publish discipline is :func:`compact_parquet_dir`'s
    staged-sibling two-rename swap, with the same honestly-stated
    caveat: run in the table's maintenance window — POSIX cannot
    exchange directories atomically. Physical erasure semantics also
    stated honestly: the OLD directory is removed after the swap, but
    space-freeing is filesystem-level deletion, not secure shredding,
    and any OTHER copy of the data (snapshots, downstream tables,
    backups) needs its own erase pass — this function is the per-table
    primitive a compliance pipeline fans out.
    """
    df = spark.read.parquet(path)
    n_files = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    rows_before = df.count()
    if not keys:  # a no-op deletion request must not rewrite the table
        # (and createDataFrame cannot infer a schema from an empty list)
        return {
            "rows_before": rows_before,
            "rows_erased": 0,
            "rows_after": rows_before,
            "n_files": n_files,
        }
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    # explicit schema from the source column: no sampling-based inference,
    # and the anti-join key types match by construction
    erase_schema = StructType([StructField(key_col, df.schema[key_col].dataType)])
    from ..functions.frames import local_frame

    erase = local_frame(
        spark, [(k,) for k in keys], erase_schema
    ).dropDuplicates()

    # restore the original column order: a USING join hoists the key to
    # the first position, and a republish must not mutate the schema
    kept = df.join(F.broadcast(erase), key_col, "left_anti").select(df.columns)
    build = tempfile.mkdtemp(
        prefix="hha_erase_", dir=os.path.dirname(os.path.abspath(path))
    )
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        kept.repartition(max(1, n_files)).write.mode("overwrite").parquet(build)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(build, path)
    shutil.rmtree(old, ignore_errors=True)
    rows_after = spark.read.parquet(path).count()
    return {
        "rows_before": rows_before,
        "rows_erased": rows_before - rows_after,
        "rows_after": rows_after,
        "n_files": sum(
            1
            for _, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ),
    }
