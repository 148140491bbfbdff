"""Pipe-delimited text source — reference-compatible ingest (SURVEY.md §2.1 S1/S2).

The reference scans ``store_sales.dat`` line-at-a-time, splits on ``|``, and
silently drops rows whose fields are empty or unparsable
(``Query 1a/TopKNetProfitDriver.java:46-76``; invalid-data taxonomy in
``CS346 Report.pdf p.2 Fig. 2``: empty attribute, unparsable numeric, missing
delimiters). Hive reads the same files as external tables with NULLs for
absent fields.

Spark's PERMISSIVE CSV mode reproduces the Hive behavior exactly: a malformed
field becomes NULL and downstream ``IS NOT NULL`` filters / NULL-ignoring
aggregates drop it — no custom parse code (SURVEY.md §2.2 P7). The read is
fully parallel and pushdown-capable; at 100 TB the same call distributes over
file splits with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import STORE, STORE_SALES


def read_pipe_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    sep: str = "|",
) -> DataFrame:
    """Schema-on-read scan of a pipe-delimited text table.

    PERMISSIVE mode: unparsable numerics → NULL (reference drop-on-
    ``NumberFormatException``), short rows → trailing NULLs (reference
    ``ArrayIndexOutOfBoundsException`` drop), empty fields → NULL via
    ``nullValue=""`` (reference ``!field.equals("")`` check).
    """
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("nullValue", "")
        .option("header", "false")
        .csv(path)
    )


def read_store_sales(spark: SparkSession, path: str) -> DataFrame:
    """The reference's fact table (Software Documentation.pdf p.6)."""
    return read_pipe_table(spark, path, STORE_SALES)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """The reference's dimension table (Software Documentation.pdf p.7)."""
    return read_pipe_table(spark, path, STORE)
