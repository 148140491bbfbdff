"""Catalog: parquet table loading + temp-view registration (SURVEY.md §2.1 S7).

The reference registers schema-on-read external tables in the Hive metastore
(``Software Documentation.pdf p.6-7``); queries then resolve table names
against it. The Spark-native equivalent is metastore-free: ``spark.read``
with explicit schemas plus ``createOrReplaceTempView`` for the SQL entry
point. On a production cluster the same functions back onto a real catalog
(Hive metastore / Unity / Glue) purely through configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

from ..schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-testdata parquet table.

    Parquet is the engine-native format: columnar, compressed, predicate/
    projection pushdown, row-group skipping — the scan properties the
    reference's flat text files lack (SURVEY.md §1.3).

    TIMESTAMP(NANOS) parquet columns (e.g. ``events.ts``) are unreadable by
    Spark's vectorized reader; we read them as raw nanos
    (``nanosAsLong``) and truncate to microsecond timestamps with INTEGER
    division — float division would lose precision at 1e18 nanos.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    declared = TESTDATA_SCHEMAS.get(name)
    if declared is not None:
        actual = {f.name: f.dataType for f in df.schema.fields}
        for f in declared.fields:
            if isinstance(f.dataType, TimestampType) and isinstance(
                actual.get(f.name), LongType
            ):
                df = df.withColumn(
                    f.name, F.timestamp_micros(F.expr(f"{f.name} DIV 1000"))
                )
    return df


def events_partitioned_path(spark: SparkSession, sf_dir: str) -> str:
    """Day-partitioned parquet layout of the events table, built once per
    ``sf_dir`` and cached under the system temp dir.

    At 100 TB this layout is what the streaming ETL sink already writes
    (``streaming.events.run_foreach_batch_etl``): facts land partitioned
    by event date so date-bounded queries scan only matching ``day=``
    directories (``PartitionFilters``) instead of the whole table. Here
    the layout is derived on demand from the flat fixture so the benched
    path exercises real partition pruning.

    Concurrency-safe publish: build into a private mkdtemp, then a single
    atomic rename to the final path — the layout is either absent or
    complete, and a losing racer discards its build.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    final = os.path.join(tempfile.gettempdir(), f"hha_events_day_{tag}")
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    build = tempfile.mkdtemp(prefix=f"hha_events_day_build_{tag}_")
    (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(build)
    )
    try:
        os.rename(build, final)
    except OSError:  # another process published first — use theirs
        shutil.rmtree(build, ignore_errors=True)
    return final


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view — the SQL entry point.

    Mirrors the reference's Hive-side surface: after registration, the whole
    query pack is runnable as ``spark.sql(...)`` strings (SURVEY.md §3.2).
    """
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


EXT_DB = "ext"


def register_external_tables(spark: SparkSession, sf_dir: str) -> None:
    """S7's DDL twin: ``CREATE TABLE … USING parquet LOCATION`` — the
    Spark-native equivalent of the reference's ``CREATE EXTERNAL TABLE``
    into the Hive metastore (Software Documentation.pdf p.6-7).

    Tables land in their own database (``ext``) so qualified names never
    collide with the temp views :func:`register_views` creates — temp
    views shadow unqualified catalog names in Spark's resolution order.
    On a bare session this uses the in-memory catalog; with
    ``enableHiveSupport`` (or Unity/Glue via config) the identical DDL
    persists in a real metastore.

    ``events`` needs its TIMESTAMP(NANOS) column converted, which schema-
    on-read DDL can't express — so the raw table registers as
    ``ext.events_raw`` (``ts`` read as raw nanos) and a catalog VIEW
    ``ext.events`` applies the same integer-division conversion
    :func:`load_table` uses. Idempotent: re-registration replaces.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {EXT_DB}")
    for name in TESTDATA_TABLES:
        target = f"{EXT_DB}.{name}_raw" if name == "events" else f"{EXT_DB}.{name}"
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        spark.sql(
            f"CREATE TABLE {target} USING parquet "
            f"LOCATION '{sf_dir}/{name}.parquet'"
        )
    spark.sql(f"DROP VIEW IF EXISTS {EXT_DB}.events")
    spark.sql(
        f"CREATE VIEW {EXT_DB}.events AS "
        f"SELECT event_id, timestamp_micros(ts DIV 1000) AS ts, user_id, "
        f"       event_type, value, props "
        f"FROM {EXT_DB}.events_raw"
    )
