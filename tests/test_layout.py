"""Layout maintenance: compaction and range clustering, effects MEASURED
via scan metrics (row-group pruning), not asserted by intent."""

from __future__ import annotations

import glob
import os

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


def test_compaction_survives_stale_old_dir(spark, sf_dir, tmp_path):
    """A leftover '<path>.old' from a crashed previous run must not make
    the publish swap fail (POSIX rename onto a non-empty dir errors —
    ADVICE r5)."""
    src = load_table(spark, sf_dir, "events").limit(1000)
    frag = str(tmp_path / "frag")
    src.repartition(8).write.parquet(frag)
    stale = frag + ".old"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("crashed run leftover")
    before = spark.read.parquet(frag).count()
    n = compact_parquet_dir(spark, frag, target_file_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(frag).count() == before
    assert not os.path.exists(stale)


def test_compaction_preserves_clustered_pruning(spark, sf_dir, tmp_path, no_aqe):
    """Compacting a range-clustered directory with the same sort_cols
    keeps row-group pruning effective: the compacted layout's scan must
    still emit only a fraction of the table for a one-day filter, and
    timestamps must stay stats-bearing micros, not INT96 (ADVICE r5 —
    the default-encoding rewrite silently pruned nothing)."""
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    clustered = str(tmp_path / "clustered")
    write_range_clustered(
        ev,
        clustered,
        ["ts"],
        n_files=8,
        **{"parquet.block.size": str(64 * 1024)},
    )
    total = ev.count()
    compact_parquet_dir(
        spark,
        clustered,
        # keep several files so range layout is observable after compaction
        target_file_bytes=max(1, sum(
            os.path.getsize(p) for p in glob.glob(f"{clustered}/*.parquet")
        ) // 4),
        sort_cols=["ts"],
    )
    files = glob.glob(f"{clustered}/*.parquet")
    assert len(files) >= 2
    # physical encoding stayed stats-bearing micros
    for p in files:
        t = pq.ParquetFile(p).schema_arrow.field("ts").type
        assert str(t).startswith("timestamp[us"), f"{p}: ts is {t}"
    pred = (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-11 00:00:00").cast("timestamp")
    )
    day_rows = ev.filter(pred).count()
    got = _scan_output_rows(spark, spark.read.parquet(clustered).filter(pred))
    # pruning still effective: scan emits well under the full table
    assert day_rows <= got <= total // 2, (day_rows, got, total)


def test_compaction_composes_with_streaming_sink(spark, sf_dir, tmp_path):
    """The two features that claim to compose, composed: the foreachBatch
    streaming ETL lands day-partitioned parquet; compacting one CLOSED
    ``day=`` partition in place (the documented production pattern) must
    reduce its file count without changing the table the readers see."""
    from hadoop_hive_analysis_spark.streaming.events import (
        read_events_stream,
        run_foreach_batch_etl,
    )

    out = str(tmp_path / "etl_out")
    run_foreach_batch_etl(
        read_events_stream(spark, sf_dir), out, str(tmp_path / "ck_etl")
    )
    days = sorted(d for d in os.listdir(out) if d.startswith("day="))
    assert days, "ETL sink landed no day partitions"
    target = os.path.join(out, days[0])
    # fragment the closed partition the way many micro-batches would
    frag_src = spark.read.parquet(target)
    n_before_rows = frag_src.count()
    frag_src.repartition(12).write.mode("overwrite").parquet(target)
    assert len(glob.glob(f"{target}/*.parquet")) == 12

    before_table = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    n = compact_parquet_dir(spark, target, target_file_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(target).count() == n_before_rows
    after_table = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert after_table == before_table


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


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path, no_aqe):
    """Z-order vs lexicographic multi-key clustering, MEASURED: on a
    layout sorted (user_id, then ts) a ts-only filter prunes ~nothing
    (the second sort key has no file-level locality), while the Z-order
    layout keeps row-group pruning effective on BOTH dimensions, and
    the rewrite preserves content exactly."""
    from hadoop_hive_analysis_spark.sources.layout import (
        write_range_clustered,
        write_zorder_clustered,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tsec"), "value"
    )
    total = ev.count()
    lexi, zord = str(tmp_path / "lexi"), str(tmp_path / "zord")
    small = {"parquet.block.size": str(32 * 1024)}
    write_range_clustered(ev, lexi, ["user_id", "tsec"], n_files=8, **small)
    write_zorder_clustered(ev, zord, ["user_id", "tsec"], n_files=8, **small)

    z_df = spark.read.parquet(zord)
    assert z_df.count() == total
    assert z_df.exceptAll(ev).count() == 0 and ev.exceptAll(z_df).count() == 0
    assert set(z_df.columns) == set(ev.columns)  # helper cols dropped

    bounds = ev.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("tsec").alias("tlo"), F.max("tsec").alias("thi"),
    ).collect()[0]
    # ~10% slice in each dimension
    u_cut = bounds.ulo + (bounds.uhi - bounds.ulo) // 10
    t_cut = bounds.tlo + (bounds.thi - bounds.tlo) // 10
    u_pred = F.col("user_id") <= u_cut
    t_pred = F.col("tsec") <= t_cut

    def scanned(path, pred):
        return _scan_output_rows(spark, spark.read.parquet(path).filter(pred))

    # leading-key filter: both layouts prune
    assert scanned(lexi, u_pred) <= total // 2
    assert scanned(zord, u_pred) <= total // 2
    # trailing-dimension filter: lexicographic layout reads ~everything,
    # Z-order still skips a measurable share of row groups
    lexi_t, zord_t = scanned(lexi, t_pred), scanned(zord, t_pred)
    assert lexi_t >= total * 9 // 10, (lexi_t, total)
    assert zord_t <= (total * 3) // 4, (zord_t, lexi_t, total)


def test_bloom_filter_skips_absent_key_lookups(spark, sf_dir, tmp_path, no_aqe):
    """Point lookup of an ABSENT key inside the global min/max range:
    min/max stats cannot prune (every row group's range contains the
    probe), so the plain layout scans everything; the bloom-indexed
    layout must skip every row group. Present-key lookups stay correct."""
    from hadoop_hive_analysis_spark.sources.layout import write_bloom_indexed

    # spread ids so absent values exist INSIDE the occupied range
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") * 2).alias("event_id"), "user_id", "value"
    )
    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    ev.repartition(4).write.mode("overwrite").option(
        "parquet.block.size", str(64 * 1024)
    ).parquet(plain)
    write_bloom_indexed(
        ev, bloom, ["event_id"], n_files=4, expected_ndv=100_000,
        **{"parquet.block.size": str(64 * 1024)},
    )
    total = ev.count()
    mx = ev.agg(F.max("event_id")).first()[0]
    probe = mx // 2
    if probe % 2 == 0:
        probe += 1  # odd -> guaranteed absent, inside [min, max]

    got_plain = _scan_output_rows(
        spark, spark.read.parquet(plain).filter(F.col("event_id") == probe)
    )
    got_bloom = _scan_output_rows(
        spark, spark.read.parquet(bloom).filter(F.col("event_id") == probe)
    )
    assert got_plain == total  # min/max can't help an in-range probe
    assert got_bloom == 0      # bloom proves absence per row group
    # present key: bloom layout still returns the right row
    present = ev.select("event_id").first()[0]
    rows = (
        spark.read.parquet(bloom)
        .filter(F.col("event_id") == present)
        .collect()
    )
    assert len(rows) >= 1 and all(r.event_id == present for r in rows)


def test_erase_rows_removes_subjects_and_audits(spark, sf_dir, tmp_path):
    """Right-to-be-forgotten: every row of the erased subjects is gone,
    every other row survives byte-identically, the audit counts are
    exact, and a second (idempotent) erase removes nothing."""
    from hadoop_hive_analysis_spark.sources.catalog import load_table
    from hadoop_hive_analysis_spark.sources.layout import erase_rows

    src = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_table")
    src.write.parquet(path)

    subjects = [r["user_id"] for r in src.select("user_id").distinct().limit(3).collect()]
    before = src.count()
    expect_erased = src.filter(src.user_id.isin(subjects)).count()
    keep_rows = sorted(
        tuple(r) for r in src.filter(~src.user_id.isin(subjects)).collect()
    )

    audit = erase_rows(spark, path, subjects)
    assert audit["rows_before"] == before
    assert audit["rows_erased"] == expect_erased > 0
    assert audit["rows_after"] == before - expect_erased

    back = spark.read.parquet(path)
    assert back.filter(back.user_id.isin(subjects)).count() == 0
    assert sorted(tuple(r) for r in back.collect()) == keep_rows

    again = erase_rows(spark, path, subjects)
    assert again["rows_erased"] == 0
    assert again["rows_after"] == audit["rows_after"]


def test_erase_rows_empty_keys_is_noop(spark, sf_dir, tmp_path):
    """A no-op deletion request (empty keys) returns a zero-erasure audit
    and leaves the files untouched (ADVICE r9: createDataFrame cannot
    infer a schema from an empty list, so this used to raise)."""
    import os

    from hadoop_hive_analysis_spark.sources.catalog import load_table
    from hadoop_hive_analysis_spark.sources.layout import erase_rows

    src = load_table(spark, sf_dir, "events").limit(50)
    path = str(tmp_path / "events_table")
    src.write.parquet(path)
    mtimes_before = {
        f: os.stat(os.path.join(path, f)).st_mtime_ns
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }

    audit = erase_rows(spark, path, [])
    assert audit["rows_erased"] == 0
    assert audit["rows_before"] == audit["rows_after"] == 50
    mtimes_after = {
        f: os.stat(os.path.join(path, f)).st_mtime_ns
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert mtimes_after == mtimes_before  # not republished
