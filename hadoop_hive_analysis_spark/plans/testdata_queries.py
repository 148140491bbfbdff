"""Reference query pack mapped onto the driver testdata (FIXTURES.md §3).

Each query exists in TWO forms, mirroring the reference's Hadoop/Hive
duality (SURVEY.md §3.4):

* a DataFrame-API callable ``(spark, sf_dir) -> DataFrame`` composed from
  :mod:`..operators.core`;
* a single ANSI-SQL string (in ``SQL``) that BOTH Spark SQL and the DuckDB
  oracle can run verbatim — the ``*_sql`` callables execute it via
  ``spark.sql`` over registered views, proving the dual surface compiles to
  the same results.

Determinism contract (drives the oracle value-hash):
* money aggregates run in EXACT integer-cents arithmetic (functions.money)
  with one final division — parallel summation order can never change a
  bit, and the hot path stays pure int64 codegen;
* quantity sums go through BIGINT;
* every top-K carries a unique tie-break key (SURVEY.md §2.5);
* all computed columns are aliased identically in both forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money
from ..operators.core import (
    date_range_filter,
    grouped_sum,
    not_null,
    project,
    right_outer_join_coalesce,
    top_k,
)
from ..sources.catalog import load_table, register_views

# Analog of the reference's full-range date bounds
# (ss_sold_date_sk ∈ [2450816, 2452642] → l_shipdate ∈ [1996, 1998]).
DATE_LO = "1996-01-01"
DATE_HI = "1998-12-31"
# Analog of the reference's Q1c narrower window (11.7M of 115.2M rows).
NARROW_LO = "1997-01-01"
NARROW_HI = "1997-06-30"
K = 5


def _ts(s: str) -> Column:
    return F.to_timestamp(F.lit(s))


def revenue_expr() -> Column:
    """``l_extendedprice * (1 - l_discount)`` in exact INTEGER CENTS.

    The inputs are 2-decimal money values stored as double; rounding to
    integer cents recovers the exact values identically in Spark and
    DuckDB, and the int64 product/sum is order-independent AND pure
    integer codegen (measured 2.7× over the decimal form — see
    functions.money for the overflow trade-off and the decimal variant).
    Callers divide the summed cents by ``REVENUE_CENTS_SCALE`` once.
    """
    return F.expr(money.REVENUE_CENTS)


def q1a_top_suppliers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1a analog: top-K suppliers by revenue, date-bounded, desc.

    Reference: top-K stores by SUM(ss_net_profit)
    (Software Documentation.pdf p.1; Query 1a/TopKNetProfitDriver.java).
    Covers SURVEY §2 S1, P1, P5, P6, P8, A1, A3(auto), T1, T2, T4, F2.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li = project(li, "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li = date_range_filter(li, "l_shipdate", _ts(DATE_LO), _ts(DATE_HI))
    li = not_null(li, "l_suppkey")
    agg = grouped_sum(li, "l_suppkey", revenue_expr(), "revenue")
    agg = agg.withColumn("revenue", F.col("revenue") / F.lit(money.REVENUE_CENTS_SCALE))
    return top_k(agg, [F.col("revenue").desc(), F.col("l_suppkey").asc()], K)


def q1b_top_parts_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1b analog: top-K parts by SUM(quantity)
    (Software Documentation.pdf p.2; Query 1b/TopKSoldItemsDriver.java)."""
    li = load_table(spark, sf_dir, "lineitem")
    li = project(li, "l_partkey", "l_shipdate", "l_quantity")
    li = date_range_filter(li, "l_shipdate", _ts(DATE_LO), _ts(DATE_HI))
    li = not_null(li, "l_partkey")
    agg = grouped_sum(li, "l_partkey", F.col("l_quantity").cast("bigint"), "sum_qty")
    agg = agg.withColumn("sum_qty", F.col("sum_qty").cast("bigint"))
    return top_k(agg, [F.col("sum_qty").desc(), F.col("l_partkey").asc()], K)


def q1c_top_dates_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1c analog: top-K ship dates by revenue over a narrow window
    (Software Documentation.pdf p.3; Query 1c/TopKNetProfitByDateDriver.java).
    Groups by calendar day — the analog of grouping by the date surrogate
    key, whose order the reference's EDA showed is chronological."""
    li = load_table(spark, sf_dir, "lineitem")
    li = project(li, "l_shipdate", "l_extendedprice", "l_discount")
    li = date_range_filter(li, "l_shipdate", _ts(NARROW_LO), _ts(NARROW_HI))
    li = not_null(li, "l_shipdate")
    li = li.withColumn("ship_date", F.to_date("l_shipdate"))
    agg = grouped_sum(li, "ship_date", revenue_expr(), "revenue")
    agg = agg.withColumn("revenue", F.col("revenue") / F.lit(money.REVENUE_CENTS_SCALE))
    return top_k(agg, [F.col("revenue").desc(), F.col("ship_date").asc()], K)


def q2_supplier_revenue_rightouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: per-supplier revenue ⟖ supplier dim, COALESCE, key-asc.

    Reference: 3-job reduce-side right-outer join of store profit with
    employee counts (Query 2/TopKStoreProfitEmployeesDriver.java; HiveQL at
    Software Documentation.pdf p.5). ``s_acctbal IS NOT NULL`` stands in for
    the employee-count null-exclusion; the revenue side is restricted to
    even supplier keys so the COALESCE(no-sales → 0) path is exercised
    deterministically on any fixture. Covers J1, F1, T3, S3.

    The aggregated revenue side (one row per supplier) is broadcast — for a
    right-outer join the hash build side must be the non-preserved (left)
    side, and post-aggregation it is tiny at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li = project(li, "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li = date_range_filter(li, "l_shipdate", _ts(DATE_LO), _ts(DATE_HI))
    li = not_null(li, "l_suppkey")
    li = li.filter(F.col("l_suppkey") % 2 == 0)
    rev = grouped_sum(li, "l_suppkey", revenue_expr(), "revenue")
    rev = rev.withColumn("revenue", F.col("revenue") / F.lit(money.REVENUE_CENTS_SCALE))

    supp = load_table(spark, sf_dir, "supplier")
    supp = project(supp, "s_suppkey", "s_acctbal")
    supp = not_null(supp, "s_acctbal")

    joined = right_outer_join_coalesce(
        rev,
        supp,
        F.col("l_suppkey") == F.col("s_suppkey"),
        "revenue",
        0.0,
        broadcast_left=True,
    )
    out = joined.select("s_suppkey", "revenue", "s_acctbal")
    return top_k(out, [F.col("s_suppkey").asc()], 10)


# One SQL text per query, runnable verbatim by BOTH Spark SQL and DuckDB.
from ..functions.money import REVENUE_CENTS as _REV_CENTS

SQL: dict[str, str] = {
    "q1a_top_suppliers_by_revenue": f"""
        SELECT l_suppkey, CAST(SUM({_REV_CENTS}) / 10000.0 AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{DATE_LO} 00:00:00'
          AND l_shipdate <= TIMESTAMP '{DATE_HI} 00:00:00'
          AND l_suppkey IS NOT NULL
        GROUP BY l_suppkey
        ORDER BY revenue DESC, l_suppkey ASC
        LIMIT {K}
    """,
    "q1b_top_parts_by_quantity": f"""
        SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{DATE_LO} 00:00:00'
          AND l_shipdate <= TIMESTAMP '{DATE_HI} 00:00:00'
          AND l_partkey IS NOT NULL
        GROUP BY l_partkey
        ORDER BY sum_qty DESC, l_partkey ASC
        LIMIT {K}
    """,
    "q1c_top_dates_by_revenue": f"""
        SELECT CAST(l_shipdate AS DATE) AS ship_date,
               CAST(SUM({_REV_CENTS}) / 10000.0 AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{NARROW_LO} 00:00:00'
          AND l_shipdate <= TIMESTAMP '{NARROW_HI} 00:00:00'
          AND l_shipdate IS NOT NULL
        GROUP BY CAST(l_shipdate AS DATE)
        ORDER BY revenue DESC, ship_date ASC
        LIMIT {K}
    """,
    "q2_supplier_revenue_rightouter": f"""
        SELECT s.s_suppkey,
               CAST(COALESCE(r.revenue, 0) AS DOUBLE) AS revenue,
               s.s_acctbal
        FROM (
            SELECT l_suppkey, CAST(SUM({_REV_CENTS}) / 10000.0 AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{DATE_LO} 00:00:00'
              AND l_shipdate <= TIMESTAMP '{DATE_HI} 00:00:00'
              AND l_suppkey IS NOT NULL
              AND l_suppkey % 2 = 0
            GROUP BY l_suppkey
        ) r
        RIGHT OUTER JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE s.s_acctbal IS NOT NULL
        ORDER BY s.s_suppkey ASC
        LIMIT 10
    """,
}


def q1a_via_ddl_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1a resolved through DDL-registered external tables — the catalog
    twin of the temp-view entry point (SURVEY §2.1 S7; the reference's
    ``CREATE EXTERNAL TABLE`` surface, Software Documentation.pdf p.6-7).

    Same SQL text as ``q1a_top_suppliers_by_revenue``, but the table name
    resolves against ``ext.lineitem`` created via
    ``CREATE TABLE … USING parquet LOCATION`` — proving the DDL catalog
    path yields bit-identical results to the DataFrame and temp-view
    entry points (one shared DuckDB oracle).
    """
    from ..sources.catalog import EXT_DB, register_external_tables

    register_external_tables(spark, sf_dir)
    sql = SQL["q1a_top_suppliers_by_revenue"].replace(
        "FROM lineitem", f"FROM {EXT_DB}.lineitem"
    )
    return spark.sql(sql)


def make_raw_sql_runner(name: str, sql: str):
    """SQL dual from an explicit portable SQL text (extension queries)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = f"{name}_sql"
    run.__doc__ = f"Spark-SQL dual of {name} (same text as the DuckDB oracle)."
    return run


def make_sql_runner(name: str):
    """Build the ``*_sql`` dual: run the SAME text through Spark SQL.

    Demonstrates entry point 2 (SURVEY.md §3.2): views registered, one SQL
    string, Catalyst compiles it to the same physical plan shape as the
    DataFrame form.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(SQL[name])

    run.__name__ = f"{name}_sql"
    run.__doc__ = f"Spark-SQL dual of {name} (same SQL text as the DuckDB oracle)."
    return run
