"""Layout maintenance: compaction and range clustering, effects MEASURED
via scan metrics (row-group pruning), not asserted by intent."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hadoop_hive_analysis_spark.sources.catalog import load_table
from hadoop_hive_analysis_spark.sources.layout import (
    compact_parquet_dir,
    write_range_clustered,
)


def _scan_output_rows(spark, df) -> int:
    """numOutputRows of the leaf parquet scan = rows SURVIVING row-group
    pruning + pushed filters (AQE disabled for the probe so the metric is
    reachable on the final plan). Executes via collect() so the metrics
    belong to THIS DataFrame's QueryExecution — a write action plans a
    separate command whose metrics this handle never sees."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        m = node.metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


@pytest.fixture()
def no_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    # simulate the streaming sink's fragmentation: many tiny files
    src.repartition(40).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 40
    before = src.count()
    n = compact_parquet_dir(spark, frag, target_file_bytes=1 << 30)
    assert n == 1  # fixture bytes << 1 GiB target
    assert len(glob.glob(f"{frag}/*.parquet")) == 1
    after_df = spark.read.parquet(frag)
    assert after_df.count() == before
    # exact content preserved (order-insensitive)
    assert (
        after_df.exceptAll(src).count() == 0
        and src.exceptAll(after_df).count() == 0
    )


def test_range_clustering_prunes_row_groups(spark, sf_dir, tmp_path, no_aqe):
    """The same one-day filter over the same rows: the clustered layout's
    scan must emit a small fraction of the rows the shuffled layout's
    scan emits — direct evidence of parquet min/max row-group pruning.
    Small row groups force multiple groups per file so pruning is
    observable at fixture scale."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    write_range_clustered(
        ev,
        clustered,
        ["ts"],
        n_files=4,
        **{"parquet.block.size": str(64 * 1024)},
    )
    # adversarial baseline: round-robin shuffle = every row group spans
    # the whole month (same stats-bearing timestamp encoding, so the
    # comparison isolates LAYOUT, not encoding)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        ev.repartition(4).write.mode("overwrite").option(
            "parquet.block.size", str(64 * 1024)
        ).parquet(shuffled)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    pred = (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-11 00:00:00").cast("timestamp")
    )
    total = ev.count()
    day_rows = ev.filter(pred).count()
    assert 0 < day_rows < total / 10  # the filter is genuinely selective

    got_clustered = _scan_output_rows(
        spark, spark.read.parquet(clustered).filter(pred)
    )
    got_shuffled = _scan_output_rows(
        spark, spark.read.parquet(shuffled).filter(pred)
    )
    # shuffled layout cannot skip anything: every row group spans the key
    assert got_shuffled == total
    # clustered layout reads only the row groups overlapping the day:
    # with 4 range files over ~31 days, one day overlaps at most 2 files
    # => at most half the rows; every overlapped group still contains at
    # least the day's rows
    assert day_rows <= got_clustered <= total // 2, (got_clustered, total)
    # and both return identical query results
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(clustered).filter(pred).collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(shuffled).filter(pred).collect()
    )
    assert a == b
