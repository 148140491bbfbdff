"""TPC-H-style analytical queries on the testdata — the broader query
vocabulary a reference user grows into (the reference's own dataset is
TPC-DS-derived; these are the canonical star-schema shapes).

All money math in exact integer cents (functions.money); averages divide
exact sums as doubles; every top-K carries a tie-break.

Overflow note (100 TB): the Q1-analog ``sum_charge`` accumulates
cents×10⁴ units (~10¹¹/row); int64 holds ~10⁷ such rows per group —
beyond that switch the charge sum to the DECIMAL variant documented in
functions/money.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_PRICE_C = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_DISC_C = "CAST(round(l_discount * 100, 0) AS BIGINT)"
_TAX_C = "CAST(round(l_tax * 100, 0) AS BIGINT)"
_QTY = "CAST(l_quantity AS BIGINT)"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: the pricing-summary report.

    One scan + one grouped aggregation with 8 aggregates (all partial→
    final); charge = price·(1−disc)·(1+tax) in exact cents·10⁴ units.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )
    disc_price = f"{_PRICE_C} * (100 - {_DISC_C})"
    charge = f"{_PRICE_C} * (100 - {_DISC_C}) * (100 + {_TAX_C})"
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(_QTY)).cast("bigint").alias("sum_qty"),
            (F.sum(F.expr(_PRICE_C)) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(F.expr(disc_price)) / F.lit(10_000.0)).alias("sum_disc_price"),
            (F.sum(F.expr(charge)) / F.lit(1_000_000.0)).alias("sum_charge"),
            (F.sum(F.expr(_QTY)).cast("double") / n).alias("avg_qty"),
            ((F.sum(F.expr(_PRICE_C)) / F.lit(100.0)).cast("double") / n).alias(
                "avg_price"
            ),
            ((F.sum(F.expr(_DISC_C)) / F.lit(100.0)).cast("double") / n).alias(
                "avg_disc"
            ),
            n.cast("bigint").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        )
    )


PRICING_SUMMARY_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_QTY}) AS BIGINT) AS sum_qty,
           SUM({_PRICE_C}) / 100.0 AS sum_base_price,
           SUM({_PRICE_C} * (100 - {_DISC_C})) / 10000.0 AS sum_disc_price,
           SUM({_PRICE_C} * (100 - {_DISC_C}) * (100 + {_TAX_C})) / 1000000.0
               AS sum_charge,
           CAST(SUM({_QTY}) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM({_PRICE_C}) / 100.0 AS DOUBLE) / count(*) AS avg_price,
           CAST(SUM({_DISC_C}) / 100.0 AS DOUBLE) / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top unshipped-revenue orders for one segment.

    Catalyst shape: customer filtered+broadcast into orders, the result
    shuffle-joined with lineitem on orderkey, grouped, TakeOrdered top-10.
    """
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            F.expr(f"{_PRICE_C} * (100 - {_DISC_C})").alias("rev_c"),
        )
    )
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        (F.sum("rev_c") / F.lit(10_000.0)).alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("o_orderkey").asc()
    ).limit(10)


SHIPPING_PRIORITY_SQL = f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           SUM({_PRICE_C} * (100 - {_DISC_C})) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: orders priced >1.5× their customer's
    average. Implemented as a window (Catalyst decorrelates the subquery
    form to the same plan); the predicate compares EXACT integers —
    ``2·price_c·n > 3·sum_c`` avoids any float average entirely."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    w = Window.partitionBy("o_custkey")
    df = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        cents.alias("c"),
        F.sum(cents).over(w).alias("sum_c"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return df.filter(2 * F.col("c") * F.col("n") > 3 * F.col("sum_c")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


ORDERS_ABOVE_AVG_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE 2 * CAST(round(o_totalprice * 100, 0) AS BIGINT)
            * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          > 3 * (SELECT SUM(CAST(round(i.o_totalprice * 100, 0) AS BIGINT))
                 FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand: fact joined to the ``part`` dimension
    (broadcast), grouped on a dimension attribute — the classic
    star-schema drill-down; completes testdata table coverage."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.expr(f"{_PRICE_C} * (100 - {_DISC_C})").alias("rev_c")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum("rev_c") / F.lit(10_000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select("p_brand", "revenue", "n_lines")
    )


BRAND_REVENUE_SQL = f"""
    SELECT p_brand,
           SUM({_PRICE_C} * (100 - {_DISC_C})) / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
"""


# Whole-table scalar sums get NO group-key to bound them, so this is the
# one query whose accumulator CAN exceed the int-cents path's exact range
# (~$9·10¹¹, functions/money.py) at true 100 TB. It therefore sums in
# DECIMAL: each term is an exact integer (cents × discount-points < 10¹⁰
# « the DECIMAL(18,0) cap) and Spark widens the SUM accumulator to
# DECIMAL(38,0) — overflow-proof to ~10²⁸ rows — while DuckDB computes the
# identical exact integer sum, so the value hash still matches.
_PRICE_C_DEC = f"CAST({_PRICE_C} AS DECIMAL(18,0))"
_DISC_C_DEC = f"CAST({_DISC_C} AS DECIMAL(18,0))"


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: revenue delta from discounted small-quantity lines
    — a pure filter-and-sum whose every predicate pushes to the scan
    (the canonical pushdown showcase: no join, no wide shuffle, one
    scalar out). Decimal accumulator: see ``_PRICE_C_DEC`` note."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (
            F.sum(F.expr(f"{_PRICE_C_DEC} * {_DISC_C_DEC}")).cast("double")
            / F.lit(10_000.0)
        ).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


FORECAST_REVENUE_SQL = f"""
    SELECT CAST(SUM({_PRICE_C_DEC} * {_DISC_C_DEC}) AS DOUBLE) / 10000.0
               AS revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""


def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: orders per priority having ≥1 line shipped more
    than 90 days after the order date — correlated-EXISTS shape, planned
    as a left-semi join (no row duplication, no distinct)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .select("o_orderpriority", "n_late_orders")
    )


ORDER_PRIORITY_LATE_SQL = """
    SELECT o_orderpriority, count(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
"""
