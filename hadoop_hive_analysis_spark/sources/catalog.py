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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view — the SQL entry point.

    Mirrors the reference's Hive-side surface: after registration, the whole
    query pack is runnable as ``spark.sql(...)`` strings (SURVEY.md §3.2).
    """
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
